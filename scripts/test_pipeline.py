"""End-to-end smoke harness (parity with reference scripts/test_pipeline.py).

Twelve import-isolated steps on synthetic sine-wave audio with a tiny model:
config validation → tokenizer → cleaner → chunking → mel → dataset →
collator → model forward → backward grad-finiteness → one real train epoch
with checkpoint save → sampler → optional real HF data (--hf).
Exit code 0 iff every (non-optional) step passes.
"""

import argparse
import os
import sys
import tempfile
import time
import traceback
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Pin cpu before any backend initializes: this harness runs a tiny model
# (CPU by design, like the reference's CPU smoke test), and deployment
# images BAKE JAX_PLATFORMS=<remote TPU> into every environment — so that
# var is not a user choice here and honoring it would dial the tunnel
# (blocks ~25 min when it's down). ORON_SMOKE_PLATFORM is the explicit
# override for running the smoke on a real device.
from oron_tts_tpu.utils.env import pin_platform  # noqa: E402

pin_platform(os.environ.get("ORON_SMOKE_PLATFORM") or "cpu")

TINY_MODEL = {
    "vocab_size": 65, "dim": 64, "depth": 2, "heads": 2, "ff_mult": 2,
    "text_dim": 32, "conv_layers": 2, "p_dropout": 0.0,
}


def synth_audio(duration_s: float = 1.5, sr: int = 24000, freq: float = 220.0):
    t = np.arange(int(sr * duration_s)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def step_config():
    from oron_tts_tpu.config import F5Config, load_config

    for name in ("local", "runpod", "colab", "test"):
        cfg = F5Config.from_dict(load_config(REPO_ROOT / f"configs/{name}.yaml"))
        assert cfg.audio.sample_rate == 24000
        assert cfg.audio.n_mels == 100
        assert cfg.model.vocab_size == 65
        assert cfg.model.dim % cfg.model.heads == 0


def step_tokenizer():
    from oron_tts_tpu.text import CyrillicTokenizer

    tok = CyrillicTokenizer()
    assert tok.vocab_size == 65
    ids = tok.encode("сайн байна уу", lang="mn")
    assert tok.unk_id not in ids
    assert tok.decode(ids) == "сайн байна уу"


def step_cleaner():
    from oron_tts_tpu.text import TextCleaner

    c = TextCleaner()
    out = c.clean("Тэр 25 настай, 3-р сард төрсөн!", lang="mn")
    assert "25" not in out and "хорин таван" in out
    ids = c.text_to_sequence("Сайн байна уу, 100₮ өгнө үү.", lang="mn")
    assert len(ids) > 10


def step_chunking():
    from oron_tts_tpu.models.f5tts import split_text_for_synthesis

    text = "Нэг өгүүлбэр. " * 30
    chunks = split_text_for_synthesis(text, 120)
    assert all(len(c) <= 120 for c in chunks)
    assert " ".join(chunks) == text.strip()


def step_mel():
    from oron_tts_tpu.ops.audio import AudioProcessor

    ap = AudioProcessor()
    audio = synth_audio(1.0)
    mel = np.asarray(ap.mel_spectrogram(audio))
    assert mel.shape == (100, 1 + len(audio) // 256)
    assert np.isfinite(mel).all()
    host = __import__("oron_tts_tpu.ops.mel", fromlist=["log_mel_numpy"])
    mel_np = host.log_mel_numpy(audio, ap.mel_config)
    err = np.abs(mel_np - mel)
    # host/device agreement: f32 DFT rounding (matmul-DFT on TPU, XLA FFT
    # reassociation on CPU) only perturbs bins whose true magnitude sits
    # BELOW the 1e-5 log clamp — cancellation noise near the floor turns
    # into large log deltas there, on every backend. Audible bins must
    # agree tightly; floor bins only loosely.
    audible = mel_np > -9.0
    assert err[audible].mean() < 5e-4, err[audible].mean()
    assert err[audible].max() < 1e-2, err[audible].max()
    assert err.mean() < 0.2, err.mean()  # floor-bin noise bound


def _make_dataset(n=4):
    from oron_tts_tpu.data.dataset import TTSDataset

    arrays = [synth_audio(1.0 + 0.3 * i, freq=200 + 30 * i) for i in range(n)]
    ds = TTSDataset(
        audio_arrays=arrays,
        texts=["сайн байна уу тавтай морил"] * n,
        sample_rate=24000,
    )
    ds.durations = [len(a) / 24000 for a in arrays]
    return ds


def step_dataset():
    ds = _make_dataset()
    item = ds[0]
    assert item["mel"].shape[0] == 100
    assert item["text_ids"].shape[0] == item["mel"].shape[1]
    assert item["mask"].all()


def step_collator():
    from oron_tts_tpu.data.dataset import TTSCollator

    ds = _make_dataset()
    batch = TTSCollator(pad_to_multiple=64)([ds[i] for i in range(4)])
    assert batch["mel"].shape[0] == 4
    assert batch["mel"].shape[2] % 64 == 0
    for i in range(4):
        T = batch["mel_lengths"][i]
        assert batch["mask"][i, :T].all()
        assert not batch["mask"][i, T:].any()
        assert (batch["text_ids"][i, T:] == -1).all()


def _tiny_model():
    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS

    cfg = {"sample_rate": 24000, "n_mels": 100, "model": TINY_MODEL}
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    model.init_params(0)
    return model


def step_forward():
    import jax

    model = _tiny_model()
    ds = _make_dataset()
    from oron_tts_tpu.data.dataset import TTSCollator

    batch = TTSCollator(pad_to_multiple=64)([ds[0], ds[1]])
    loss = model.forward(
        batch["mel"], batch["text_ids"], batch["mel_lengths"],
        rng=jax.random.PRNGKey(0),
    )
    loss = float(loss)
    assert np.isfinite(loss) and loss > 0


def step_backward():
    import jax

    model = _tiny_model()
    ds = _make_dataset()
    from oron_tts_tpu.data.dataset import TTSCollator

    batch = TTSCollator(pad_to_multiple=64)([ds[0], ds[1]])

    def loss_fn(params):
        return model.cfm.loss(
            {"params": params}, batch["mel"], batch["text_ids"],
            batch["mel_lengths"], jax.random.PRNGKey(1),
        )

    grads = jax.grad(loss_fn)(model.variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in leaves)


def step_train_epoch():
    from oron_tts_tpu.data.dataset import FixedBatchSampler, TTSCollator
    from oron_tts_tpu.data.loader import DataLoader
    from oron_tts_tpu.train.trainer import F5Trainer

    ds = _make_dataset()
    model = _tiny_model()
    cfg = {
        "sample_rate": 24000, "n_mels": 100, "model": TINY_MODEL,
        "learning_rate": 1e-3, "warmup_steps": 1, "num_epochs": 1,
        "use_tqdm": False, "audio_sample_interval": 1000,
    }
    loader = DataLoader(
        ds, FixedBatchSampler(len(ds), 2), TTSCollator(pad_to_multiple=64),
        num_workers=0,
    )
    with tempfile.TemporaryDirectory() as d:
        trainer = F5Trainer(
            config=cfg, model=model, train_loader=loader,
            log_dir=f"{d}/logs", checkpoint_dir=f"{d}/ckpt",
        )
        loss = trainer.train_epoch(total_epochs=1)
        assert np.isfinite(loss)
        path = trainer.save_checkpoint(loss=loss)
        assert path.exists()


def step_sampler():
    model = _tiny_model()
    wav = model.synthesize(
        "сайн байна уу", n_steps=2, target_duration_s=0.6, seed=0
    )
    assert wav.ndim == 1 and np.isfinite(wav).all() and len(wav) > 0


def step_hf_data():
    """Optional: stream 10 real samples from the hub (network required)."""
    from oron_tts_tpu.data.dataset import TTSDataset
    from oron_tts_tpu.data.hf import MBSpeechWrapper

    ds = MBSpeechWrapper().load(split="train", streaming=True)
    items = []
    for item in ds:
        items.append(item)
        if len(items) >= 10:
            break
    import datasets as hfd

    small = hfd.Dataset.from_list(items)
    tts = TTSDataset.from_hf_dataset(small, text_column="sentence_norm")
    assert len(tts) > 0
    item = tts[0]
    assert item["mel"].shape[0] == 100


STEPS = [
    ("config validation", step_config),
    ("tokenizer", step_tokenizer),
    ("text cleaner", step_cleaner),
    ("text chunking", step_chunking),
    ("mel extraction", step_mel),
    ("dataset", step_dataset),
    ("collator", step_collator),
    ("model forward", step_forward),
    ("backward grads finite", step_backward),
    ("train epoch + checkpoint", step_train_epoch),
    ("sampler synthesis", step_sampler),
]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--hf", action="store_true",
                        help="also stream 10 real samples from the HF hub")
    args = parser.parse_args()

    steps = list(STEPS)
    if args.hf:
        steps.append(("HF real data (10 samples)", step_hf_data))

    failed = []
    for i, (name, fn) in enumerate(steps, 1):
        t0 = time.monotonic()
        try:
            fn()
            print(f"[{i:2d}/{len(steps)}] PASS {name} ({time.monotonic() - t0:.1f}s)")
        except Exception:
            print(f"[{i:2d}/{len(steps)}] FAIL {name}")
            traceback.print_exc()
            failed.append(name)
    if failed:
        print(f"\nFAILED steps: {failed}")
        sys.exit(1)
    print(f"\nAll {len(steps)} steps passed.")


if __name__ == "__main__":
    main()
