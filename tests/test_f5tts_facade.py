"""Facade tests: chunking parity, checkpoint roundtrip, synthesize e2e."""

import numpy as np
import pytest

from oron_tts_tpu.config import F5Config, load_config
from oron_tts_tpu.models.f5tts import (
    F5TTS,
    concat_with_pause,
    split_text_for_synthesis,
    stretch_text_to_len,
)

TINY_CFG = {
    "sample_rate": 24000, "n_fft": 1024, "hop_length": 256, "n_mels": 100,
    "model": {
        "vocab_size": 65, "dim": 64, "depth": 2, "heads": 2, "ff_mult": 2,
        "text_dim": 32, "conv_layers": 2, "p_dropout": 0.0,
    },
}


def test_split_text_behavior():
    text = "Нэг өгүүлбэр. Хоёр дахь өгүүлбэр, урт үргэлжилсэн; гурав дахь хэсэг."
    chunks = split_text_for_synthesis(text, 30)
    assert all(len(c) <= 30 for c in chunks)
    assert " ".join(chunks).replace("  ", " ") == text
    assert split_text_for_synthesis("  ", 10) == []
    assert split_text_for_synthesis("abc", 0) == ["abc"]


def test_split_text_parity_with_reference():
    from tests.conftest import add_reference_to_path, reference_available

    if not reference_available():
        pytest.skip("no reference")
    add_reference_to_path()
    from src.models.f5tts import split_text_for_synthesis as ref_split

    cases = [
        ("Нэг. Хоёр, гурав; дөрөв тав зургаа долоо найм ес арав." * 5, 40),
        ("үг " * 100, 25),
        ("нэгwords  нэг хоёр гурав", 8),
        ("а" * 300, 120),
    ]
    for text, mx in cases:
        assert ref_split(text, mx) == split_text_for_synthesis(text, mx)


def test_stretch_text_parity_with_reference():
    from tests.conftest import add_reference_to_path, reference_available

    if not reference_available():
        pytest.skip("no reference")
    add_reference_to_path()
    from src.data.dataset import _stretch_text_to_len as ref_stretch

    for ids, tgt in [([1, 2, 3], 10), ([], 5), (list(range(20)), 7), ([4], 1)]:
        assert ref_stretch(ids, tgt) == stretch_text_to_len(ids, tgt)


def test_concat_with_pause():
    a = np.ones(10, np.float32)
    b = np.full(5, 2.0, np.float32)
    out = concat_with_pause([a, b], 24000, 0.001)
    assert len(out) == 10 + 24 + 5
    assert (out[10:34] == 0).all()
    assert len(concat_with_pause([a], 24000, 1.0)) == 10
    assert len(concat_with_pause([a, b], 24000, 0.0)) == 15


def test_from_config_and_validation():
    model = F5TTS.from_config(TINY_CFG)
    assert model.n_mels == 100
    model.init_params(0)
    assert model.num_params() > 0
    for kwargs in [
        {"n_steps": 0}, {"cfg_strength": -1}, {"speed": 0},
        {"target_duration_s": -2.0}, {"pause_s": -1},
    ]:
        with pytest.raises(ValueError):
            model.synthesize("сайн", **kwargs)
    with pytest.raises(ValueError):
        model.synthesize("x", lang="en")
    with pytest.raises(ValueError):
        model.synthesize("   ")


def test_synthesize_end_to_end_griffin_lim(tmp_path):
    model = F5TTS.from_config(TINY_CFG)
    model.init_params(0)
    wav = model.synthesize(
        "Сайн байна уу", n_steps=2, cfg_strength=2.0, seed=5,
        target_duration_s=0.6,
    )
    assert wav.ndim == 1
    assert np.isfinite(wav).all()
    # 0.6 s at 24 kHz ≈ 56 frames, ISTFT returns (T-1)*hop samples
    assert len(wav) > 0.4 * 24000

    # same seed → identical output; different seed → different
    wav2 = model.synthesize(
        "Сайн байна уу", n_steps=2, cfg_strength=2.0, seed=5,
        target_duration_s=0.6,
    )
    np.testing.assert_array_equal(wav, wav2)


def test_synthesize_with_ref_audio(tmp_path):
    from oron_tts_tpu.data.wav import write_wav

    sr = 24000
    t = np.arange(sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ref_path = tmp_path / "ref.wav"
    write_wav(ref_path, ref, sr)

    model = F5TTS.from_config(TINY_CFG)
    model.init_params(0)
    wav = model.synthesize(
        "Сайн байна уу",
        ref_audio_path=ref_path,
        ref_text="тийм",
        n_steps=2,
        seed=1,
    )
    assert np.isfinite(wav).all() and len(wav) > 0


def test_chunked_synthesis_matches_serial(tmp_path):
    """Long-text synthesis batches chunk solves; each chunk's audio must
    match the serial path — synthesizing that chunk alone with the serial
    chunk seed (seed+idx) — so batching is purely a latency optimization."""
    model = F5TTS.from_config(TINY_CFG)
    model.init_params(0)
    text = "Нэг өгүүлбэр энд байна. Хоёр дахь өгүүлбэр арай урт байгаа. За."
    chunks = split_text_for_synthesis(text, 30)
    assert len(chunks) >= 3
    batched = model.synthesize(
        text, n_steps=2, seed=11, max_chars_per_chunk=30, pause_s=0.01,
    )
    serial = [
        model.synthesize(c, n_steps=2, seed=11 + i, max_chars_per_chunk=0)
        for i, c in enumerate(chunks)
    ]
    expected = concat_with_pause(serial, model.sample_rate, 0.01)
    assert batched.shape == expected.shape
    np.testing.assert_allclose(batched, expected, rtol=2e-4, atol=2e-5)


def test_chunked_synthesis_with_ref_matches_serial(tmp_path):
    """Voice-cloned long text: batched chunk solves share the ref mel and
    still match per-chunk serial synthesis."""
    from oron_tts_tpu.data.wav import write_wav

    sr = 24000
    t = np.arange(sr // 2) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ref_path = tmp_path / "ref.wav"
    write_wav(ref_path, ref, sr)

    model = F5TTS.from_config(TINY_CFG)
    model.init_params(0)
    text = "Нэг өгүүлбэр энд байна. Хоёр дахь өгүүлбэр арай урт байгаа."
    chunks = split_text_for_synthesis(text, 30)
    assert len(chunks) >= 2
    kw = dict(ref_audio_path=ref_path, ref_text="тийм", n_steps=2)
    batched = model.synthesize(
        text, seed=3, max_chars_per_chunk=30, pause_s=0.0, **kw
    )
    serial = np.concatenate([
        model.synthesize(c, seed=3 + i, max_chars_per_chunk=0, **kw)
        for i, c in enumerate(chunks)
    ])
    assert batched.shape == serial.shape
    np.testing.assert_allclose(batched, serial, rtol=2e-4, atol=2e-5)


def test_synthesize_stream_concat_equals_synthesize():
    """Concatenating every streamed piece reproduces synthesize() exactly,
    for both the single-chunk and the multi-chunk (grouped solve) paths."""
    model = F5TTS.from_config(TINY_CFG)
    model.init_params(0)
    short = "сайн байна уу"
    pieces = list(model.synthesize_stream(short, n_steps=2, seed=4))
    assert len(pieces) == 1
    np.testing.assert_array_equal(
        pieces[0], model.synthesize(short, n_steps=2, seed=4)
    )

    text = "Нэг өгүүлбэр энд байна. Хоёр дахь өгүүлбэр арай урт байгаа. За."
    kw = dict(n_steps=2, seed=9, max_chars_per_chunk=30, pause_s=0.01)
    pieces = list(model.synthesize_stream(text, **kw))
    assert len(pieces) >= 3  # chunks + pauses
    # stream isolates chunk 0 into its own solve (TTFA), so vs the
    # grouped synthesize() only float reduction order may differ
    got, want = np.concatenate(pieces), model.synthesize(text, **kw)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from oron_tts_tpu.train.checkpoint import CheckpointManager

    model = F5TTS.from_config(TINY_CFG)
    variables = model.init_params(0)

    cm = CheckpointManager(tmp_path, max_checkpoints=2)
    cm.save(10, variables["params"], loss=1.5, config=TINY_CFG,
            extra_state={"epoch": 3})
    cm.save(20, variables["params"], is_best=True)
    cm.save(30, variables["params"])
    cm.save(40, variables["params"])
    # rotation keeps 2 step files + best
    steps = sorted(p.name for p in tmp_path.glob("f5tts_step_*.npz"))
    assert steps == ["f5tts_step_00000030.npz", "f5tts_step_00000040.npz"]
    assert (tmp_path / "f5tts_best.npz").exists()
    assert cm.load_config()["model"]["dim"] == 64

    info = cm.load()
    assert info["step"] == 40
    loaded_leaves = jax.tree_util.tree_leaves(info["params"])
    orig_leaves = jax.tree_util.tree_leaves(variables["params"])
    assert len(loaded_leaves) == len(orig_leaves)
    for a, b in zip(loaded_leaves, orig_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    info10 = cm.load(path=tmp_path / "f5tts_best.npz")
    assert info10["step"] == 20
    # missing file → fresh state
    fresh = CheckpointManager(tmp_path / "empty").load()
    assert fresh["step"] == 0 and fresh["params"] is None


def test_async_checkpoint_roundtrip(tmp_path):
    """async_writes=True: same on-disk contract, writes just happen on a
    writer thread that every read-side entry point joins first."""
    import jax

    from oron_tts_tpu.train.checkpoint import CheckpointManager

    model = F5TTS.from_config(TINY_CFG)
    variables = model.init_params(0)

    cm = CheckpointManager(tmp_path, max_checkpoints=2, async_writes=True)
    for step in (10, 20, 30, 40):
        cm.save(step, variables["params"], is_best=(step == 20),
                config=TINY_CFG)
    info = cm.load()  # joins the writer before reading
    assert info["step"] == 40
    steps = sorted(p.name for p in tmp_path.glob("f5tts_step_*.npz"))
    assert steps == ["f5tts_step_00000030.npz", "f5tts_step_00000040.npz"]
    assert (tmp_path / "f5tts_best.npz").exists()
    for a, b in zip(jax.tree_util.tree_leaves(info["params"]),
                    jax.tree_util.tree_leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # snapshot happens inside save(): mutating the source pytree after
    # save returns must not leak into the bytes on disk
    params = jax.tree_util.tree_map(
        lambda x: np.array(x), variables["params"]  # writable host copies
    )
    cm2 = CheckpointManager(tmp_path / "mut", async_writes=True)
    cm2.save(1, params)
    for leaf in jax.tree_util.tree_leaves(params):
        leaf.fill(7.0)
    loaded = cm2.load()
    assert not any(
        np.all(np.asarray(leaf) == 7.0)
        for leaf in jax.tree_util.tree_leaves(loaded["params"])
        if np.asarray(leaf).size
    )


def test_async_checkpoint_error_propagates(tmp_path, monkeypatch):
    """A writer-thread failure must re-raise on the next wait()/save, not
    vanish on the thread."""
    from oron_tts_tpu.train import checkpoint as ckpt

    cm = ckpt.CheckpointManager(tmp_path, async_writes=True)

    def boom(path, flat):
        raise OSError("disk full")

    monkeypatch.setattr(ckpt, "write_npz", boom)
    cm.save(1, {"w": np.zeros(2, np.float32)})
    with pytest.raises(OSError, match="disk full"):
        cm.wait()
    # error is consumed: the manager is usable again
    monkeypatch.undo()
    cm.save(2, {"w": np.zeros(2, np.float32)})
    assert cm.load()["step"] == 2


def test_stale_remote_paths():
    from oron_tts_tpu.train.checkpoint import stale_remote_checkpoint_paths

    remote = ["f5tts_step_00000010.npz", "f5tts_step_00000020.npz",
              "f5tts_best.npz", "config.json"]
    local = ["f5tts_step_00000020.npz"]
    assert stale_remote_checkpoint_paths(remote, local, "f5tts") == [
        "f5tts_step_00000010.npz"
    ]


def test_config_files_load():
    for name in ["local", "runpod", "colab", "test"]:
        cfg = F5Config.from_dict(load_config(f"configs/{name}.yaml"))
        assert cfg.audio.sample_rate == 24000
        assert cfg.model.vocab_size == 65
        assert cfg.model.dim % cfg.model.heads == 0


def test_synthesize_batch():
    model = F5TTS.from_config(TINY_CFG)
    model.init_params(0)
    texts = ["сайн байна уу", "тавтай морилно уу энд", "нэг"]
    wavs = model.synthesize_batch(texts, n_steps=2, seed=7)
    assert len(wavs) == 3
    for w in wavs:
        assert w.ndim == 1 and np.isfinite(w).all() and len(w) > 0
    # longer text → longer audio (duration ∝ char count, floor 50 frames)
    assert len(wavs[1]) > len(wavs[2])
    # deterministic given seed
    again = model.synthesize_batch(texts, n_steps=2, seed=7)
    np.testing.assert_array_equal(wavs[0], again[0])
    assert model.synthesize_batch([]) == []


def test_length_groups():
    """Sorted greedy grouping: similar lengths share a bucket, a long
    outlier gets its own, nothing dropped, max_batch respected."""
    lens = [100, 110, 1500, 105, 98, 1480]
    groups = F5TTS._length_groups(lens, pad_to_multiple=64, max_batch=16)
    covered = sorted(i for g in groups for i in g)
    assert covered == list(range(len(lens)))
    # short cluster together, long cluster together, never mixed
    for g in groups:
        vals = [lens[i] for i in g]
        assert max(vals) <= max(min(vals) * 1.3, min(vals) + 64)
    assert len(groups) == 2
    # max_batch splits an oversized cluster
    many = [100] * 40
    groups = F5TTS._length_groups(many, pad_to_multiple=64, max_batch=16)
    assert [len(g) for g in groups] == [16, 16, 8]
    # frame-budget cap: ~full-length rows solve in pairs (one B=1 CFG
    # solve already saturates the chip near B*T ~ GROUP_FRAME_BUDGET;
    # larger groups measured SLOWER per row)
    longs = [1500] * 6
    groups = F5TTS._length_groups(longs, pad_to_multiple=64, max_batch=16)
    assert [len(g) for g in groups] == [2, 2, 2]
    # under a 4-way data mesh the budget is per chip: cap scales to 8
    groups = F5TTS._length_groups(
        longs, pad_to_multiple=64, max_batch=16, row_multiple=4,
    )
    assert [len(g) for g in groups] == [6]  # one group, padded to 8 rows


def test_synthesize_batch_composition_invariant():
    """Row i's audio must not depend on its batch neighbors or the shared
    bucket length (VERDICT r1 #7; reference flow.py:269-283 seeds noise
    per sample)."""
    model = F5TTS.from_config(TINY_CFG)
    model.init_params(0)
    short = "нэг хоёр"
    long = "энэ бол нэлээд урт өгүүлбэр бөгөөд бакетыг томруулна гэж найдаж байна"
    solo = model.synthesize_batch([short], n_steps=2, seed=11)[0]
    paired = model.synthesize_batch([short, long], n_steps=2, seed=11)[0]
    np.testing.assert_array_equal(solo, paired)


def test_synthesize_batch_matches_solo_with_seeds():
    """The batcher determinism contract: with explicit per-row seeds, a
    batched row reproduces the solo synthesize() output for the same seed
    (per_row_noise keys make the draw independent of row position,
    grouping, and bucket)."""
    model = F5TTS.from_config(TINY_CFG)
    model.init_params(0)
    texts = ["нэг хоёр гурав", "сайн байна уу тавтай морилно уу", "за"]
    batched = model.synthesize_batch(texts, n_steps=2, seeds=[5, 9, 5])
    for text, s, got in zip(texts, [5, 9, 5], batched):
        solo = model.synthesize(text, n_steps=2, seed=s)
        np.testing.assert_allclose(got, solo, rtol=2e-4, atol=2e-5)
    # default seeds are seed+i (mirrors the reference's per-chunk seed+idx)
    d = model.synthesize_batch(texts[:2], n_steps=2, seed=3)
    np.testing.assert_allclose(
        d[1], model.synthesize(texts[1], n_steps=2, seed=4),
        rtol=2e-4, atol=2e-5,
    )
    with pytest.raises(ValueError):
        model.synthesize_batch(texts, seeds=[1])


def test_synthesize_batch_chunks_long_texts():
    """A long text inside a batch is chunked like synthesize() (no giant
    out-of-distribution solve) and reproduces the solo output; short
    neighbors are unaffected."""
    model = F5TTS.from_config(TINY_CFG)
    model.init_params(0)
    long_text = "Нэг өгүүлбэр энд байна. Хоёр дахь өгүүлбэр арай урт байгаа."
    short = "за"
    kw = dict(n_steps=2, max_chars_per_chunk=30)
    batched = model.synthesize_batch(
        [short, long_text], seeds=[5, 8], **kw
    )
    solo_short = model.synthesize(short, n_steps=2, seed=5)
    solo_long = model.synthesize(long_text, seed=8, **kw)
    # atol 1e-4: same noise/contract, but batch grouping changes XLA
    # fusion order in the vocoder decode → last-ulp float drift
    np.testing.assert_allclose(batched[0], solo_short, rtol=2e-4, atol=1e-4)
    assert batched[1].shape == solo_long.shape
    np.testing.assert_allclose(batched[1], solo_long, rtol=2e-4, atol=1e-4)
    with pytest.raises(ValueError):
        model.synthesize_batch(["нэг", "  "], **kw)


def test_synthesize_batch_with_ref_matches_solo(tmp_path):
    """Batched voice cloning: one ref voice across the batch, each text's
    audio identical to its solo synthesize(ref...) output."""
    from oron_tts_tpu.data.wav import write_wav

    sr = 24000
    t = np.arange(sr // 2) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ref_path = tmp_path / "ref.wav"
    write_wav(ref_path, ref, sr)

    model = F5TTS.from_config(TINY_CFG)
    model.init_params(0)
    kw = dict(ref_audio_path=ref_path, ref_text="тийм", n_steps=2)
    texts = ["сайн байна уу", "за"]
    batched = model.synthesize_batch(texts, seeds=[4, 9], **kw)
    for i, (text, s) in enumerate(zip(texts, [4, 9])):
        solo = model.synthesize(text, seed=s, **kw)
        assert batched[i].shape == solo.shape
        np.testing.assert_allclose(batched[i], solo, rtol=2e-4, atol=1e-4)


def test_bf16_param_storage_matches_f32_under_bf16_compute():
    """Storing params bf16 under bf16 compute is lossless: the compute
    path casts f32 params to bf16 at use anyway, so pre-casting (what
    load_model does on TPU — halves weight HBM/bandwidth) must reproduce
    the same audio."""
    import jax
    import jax.numpy as jnp

    from oron_tts_tpu.config import F5Config

    model = F5TTS.from_config(F5Config.from_dict(TINY_CFG),
                              dtype=jnp.bfloat16)
    model.init_params(0)
    f32_audio = model.synthesize("сайн", n_steps=2, seed=1)
    model.variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        model.variables,
    )
    bf16_audio = model.synthesize("сайн", n_steps=2, seed=1)
    assert bf16_audio.shape == f32_audio.shape
    # same values enter every matmul; only fusion details can differ
    np.testing.assert_allclose(bf16_audio, f32_audio, rtol=1e-3, atol=1e-4)


def test_cfm_sample_per_row_noise_invariance():
    """cfm.sample row outputs are invariant to batch composition and to
    bucket padding when seeded via per-row key folding."""
    import jax
    import jax.numpy as jnp

    from oron_tts_tpu.models.cfm import per_sample_noise

    key = jax.random.PRNGKey(3)
    n_a = per_sample_noise(key, 1, 64, 8)
    n_ab = per_sample_noise(key, 2, 96, 8)
    np.testing.assert_array_equal(np.asarray(n_a[0]), np.asarray(n_ab[0, :64]))
    # rows are distinct draws
    assert not np.allclose(np.asarray(n_ab[0, :64]), np.asarray(n_ab[1, :64]))
    assert np.isfinite(np.asarray(n_ab)).all()
    # unit-normal-ish statistics
    flat = np.asarray(per_sample_noise(key, 4, 128, 16)).ravel()
    assert abs(flat.mean()) < 0.05 and abs(flat.std() - 1.0) < 0.05


def test_cfm_sample_validates_jnp_inputs():
    """Concrete jnp duration/lens get host-side validation like np inputs
    (reference flow.py:191-230 always validates)."""
    import jax.numpy as jnp

    model = F5TTS.from_config(TINY_CFG)
    model.init_params(0)
    cond = jnp.zeros((1, 64, 100), jnp.float32)
    text = jnp.zeros((1, 64), jnp.int32)
    with pytest.raises(ValueError, match="lens must be <="):
        model.cfm.sample(
            model.variables, cond, text,
            duration=jnp.asarray([32]), lens=jnp.asarray([40]), steps=1,
        )
    with pytest.raises(ValueError, match="must be > 0"):
        model.cfm.sample(
            model.variables, cond, text,
            duration=jnp.asarray([0]), lens=jnp.asarray([0]), steps=1,
        )


def test_save_best_writes_config(tmp_path):
    """A dir whose ONLY checkpoint is f5tts_best.npz (run preempted before
    the first interval save) must still carry config.json, or infer would
    rebuild the default Base architecture for a non-default model."""
    from oron_tts_tpu.train.checkpoint import CheckpointManager

    model = F5TTS.from_config(TINY_CFG)
    variables = model.init_params(0)
    cm = CheckpointManager(tmp_path)
    path = cm.save_best(7, variables["params"], loss=0.9, config=TINY_CFG,
                        extra_state={"epoch": 1, "best_val": 0.9})
    assert path == tmp_path / "f5tts_best.npz" and path.exists()
    assert not list(tmp_path.glob("f5tts_step_*.npz"))
    assert cm.load_config()["model"]["dim"] == 64
    info = cm.load(path=path)
    assert info["step"] == 7 and info["best_val"] == 0.9
