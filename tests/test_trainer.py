"""Trainer tests on a tiny synthetic dataset (CPU, seconds)."""

import numpy as np
import pytest

from oron_tts_tpu.config import F5Config
from oron_tts_tpu.data.dataset import (
    DynamicBatchSampler,
    FixedBatchSampler,
    TTSCollator,
    TTSDataset,
)
from oron_tts_tpu.data.loader import DataLoader
from oron_tts_tpu.models.f5tts import F5TTS

TINY_CFG = {
    "sample_rate": 24000, "n_fft": 1024, "hop_length": 256, "n_mels": 100,
    "learning_rate": 1e-3, "warmup_steps": 2, "num_epochs": 2,
    "ema_decay": 0.999, "max_grad_norm": 1.0, "grad_accumulation_steps": 1,
    "use_tqdm": False, "log_interval": 1, "save_interval": 1,
    "max_checkpoints": 2, "audio_sample_interval": 1000,
    "model": {
        "vocab_size": 65, "dim": 64, "depth": 2, "heads": 2, "ff_mult": 2,
        "text_dim": 32, "conv_layers": 2, "p_dropout": 0.0,
    },
}


def _synthetic_dataset(n=6, sr=24000):
    rng = np.random.default_rng(0)
    arrays, texts = [], []
    for i in range(n):
        dur = 1.0 + 0.3 * i
        t = np.arange(int(sr * dur)) / sr
        arrays.append((0.4 * np.sin(2 * np.pi * (200 + 20 * i) * t)).astype(np.float32))
        texts.append("сайн байна уу тавтай морилно уу")
    ds = TTSDataset(audio_arrays=arrays, texts=texts, sample_rate=sr)
    ds.durations = [len(a) / sr for a in arrays]
    return ds


def test_dataset_item_contract():
    ds = _synthetic_dataset()
    item = ds[0]
    assert item["mel"].shape[0] == 100
    assert item["text_ids"].shape == (item["mel"].shape[1],)
    assert item["mask"].all()
    # stretched ids start with the [LANG_MN] tag token
    assert item["text_ids"][0] == 4


def test_collator_bucketing():
    ds = _synthetic_dataset()
    batch = TTSCollator(pad_to_multiple=64)([ds[0], ds[3]])
    assert batch["mel"].shape[2] % 64 == 0
    assert batch["text_ids"].shape == batch["mel"].shape[:1] + batch["mel"].shape[2:]
    T0 = batch["mel_lengths"][0]
    assert (batch["text_ids"][0, T0:] == -1).all()
    assert not batch["mask"][0, T0:].any()


def test_dataset_cache_byte_bounded():
    ds = _synthetic_dataset()
    item0 = ds[0]
    one_item = TTSDataset._item_nbytes(item0)

    # budget for ~2 items: cache stops growing but items are still served
    small = TTSDataset(
        audio_arrays=[np.asarray(a, np.float32) for a in
                      [ds._load_audio(i) for i in range(len(ds))]],
        texts=ds.texts, sample_rate=ds.sample_rate,
        cache_bytes=int(one_item * 2.5),
    )
    for i in range(len(small)):
        small[i]
    st = small.cache_stats()
    assert st["bytes"] <= st["budget_bytes"]
    assert st["items"] < len(small)
    # uncached items still decodable and identical across reads
    np.testing.assert_array_equal(small[5]["mel"], small[5]["mel"])

    # zero budget disables caching entirely
    none = TTSDataset(audio_arrays=[ds._load_audio(0)], texts=[ds.texts[0]],
                      sample_rate=ds.sample_rate, cache_bytes=0)
    none[0]
    assert none.cache_stats() == {"bytes": 0, "items": 0, "budget_bytes": 0}


def test_dynamic_batch_sampler():
    durations = [1.0, 2.0, 3.0, 1.5, 2.5, 0.5]
    s = DynamicBatchSampler(durations, frames_threshold=400, sample_rate=24000,
                            hop_length=256)
    batches = list(s)
    covered = sorted(i for b in batches for i in b)
    assert covered == list(range(6))  # nothing dropped
    for b in batches:
        frames = sum(durations[i] * 24000 / 256 for i in b)
        assert frames <= 400 or len(b) == 1
    s.set_epoch(1)
    order1 = list(s)
    s.set_epoch(2)
    order2 = list(s)
    assert order1 != order2 or len(batches) <= 1


def test_trainer_end_to_end(tmp_path):
    from oron_tts_tpu.train.trainer import F5Trainer

    ds = _synthetic_dataset()
    collator = TTSCollator(pad_to_multiple=64)
    loader = DataLoader(ds, FixedBatchSampler(len(ds), 3, seed=1), collator,
                        num_workers=0)
    val_loader = DataLoader(ds, FixedBatchSampler(len(ds), 3, shuffle=False,
                                                  drop_last=False),
                            collator, num_workers=0)
    model = F5TTS.from_config(F5Config.from_dict(TINY_CFG))
    trainer = F5Trainer(
        config=TINY_CFG, model=model, train_loader=loader, val_loader=val_loader,
        log_dir=str(tmp_path / "logs"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    loss1 = trainer.train_epoch(total_epochs=2)
    assert np.isfinite(loss1)
    val = trainer.validate()
    assert np.isfinite(val) and val > 0
    trainer.save_checkpoint(is_best=True, loss=loss1)
    assert (tmp_path / "ckpt" / "f5tts_best.npz").exists()
    step_before = trainer.global_step
    assert step_before == 2  # 6 samples / batch 3 = 2 updates

    # resume into a fresh trainer
    model2 = F5TTS.from_config(F5Config.from_dict(TINY_CFG))
    trainer2 = F5Trainer(
        config=TINY_CFG, model=model2, train_loader=loader, val_loader=None,
        log_dir=str(tmp_path / "logs2"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer2.load_checkpoint()
    assert trainer2.global_step == step_before
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.state.params),
        jax.tree_util.tree_leaves(trainer2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    loss2 = trainer2.train_epoch(total_epochs=2)
    assert np.isfinite(loss2)


def test_checkpoint_scan_layout_roundtrip(tmp_path):
    """scan_blocks=True runs store the unrolled block{i} disk layout, and a
    resume works after flipping model.scan_blocks (ADVICE r2: previously the
    stacked layout leaked to disk and cross-layout resume failed)."""
    import numpy as np

    from oron_tts_tpu.train.checkpoint import load_pytree_npz
    from oron_tts_tpu.train.trainer import F5Trainer

    cfg_scan = dict(TINY_CFG, model=dict(TINY_CFG["model"], scan_blocks=True))
    ds = _synthetic_dataset(4)
    collator = TTSCollator(pad_to_multiple=64)
    loader = DataLoader(ds, FixedBatchSampler(len(ds), 2, seed=1), collator,
                        num_workers=0)
    model = F5TTS.from_config(F5Config.from_dict(cfg_scan))
    assert model.backbone.scan_blocks
    trainer = F5Trainer(
        config=cfg_scan, model=model, train_loader=loader,
        log_dir=str(tmp_path / "logs"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer.train_epoch(total_epochs=1)
    path = trainer.save_checkpoint(loss=1.0)

    # on-disk contract: unrolled block{i}, no stacked "blocks" subtree —
    # in params, EMA, AND the Adam moments
    trees, _ = load_pytree_npz(path)
    for name in ("params", "ema"):
        assert "block0" in trees[name] and "blocks" not in trees[name]
    flat_opt_keys = " ".join(
        "/".join(str(k) for k in p)
        for p, _ in __import__("jax").tree_util.tree_flatten_with_path(
            trees["opt"])[0]
    )
    assert "block0" in flat_opt_keys and "blocks/" not in flat_opt_keys

    # resume into an UNROLLED model and keep training
    cfg_plain = dict(TINY_CFG, model=dict(TINY_CFG["model"], scan_blocks=False))
    model2 = F5TTS.from_config(F5Config.from_dict(cfg_plain))
    trainer2 = F5Trainer(
        config=cfg_plain, model=model2, train_loader=loader,
        log_dir=str(tmp_path / "logs2"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer2.load_checkpoint()
    assert trainer2.global_step == trainer.global_step
    assert "block0" in trainer2.state.params
    loss = trainer2.train_epoch(total_epochs=1)
    assert np.isfinite(loss)

    # and back into a scanned model
    model3 = F5TTS.from_config(F5Config.from_dict(cfg_scan))
    trainer3 = F5Trainer(
        config=cfg_scan, model=model3, train_loader=loader,
        log_dir=str(tmp_path / "logs3"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer3.load_checkpoint()
    assert "blocks" in trainer3.state.params
    loss = trainer3.train_epoch(total_epochs=1)
    assert np.isfinite(loss)


def test_grad_accumulation(tmp_path):
    from oron_tts_tpu.train.trainer import F5Trainer

    cfg = dict(TINY_CFG, grad_accumulation_steps=2)
    ds = _synthetic_dataset(4)
    collator = TTSCollator(pad_to_multiple=64)
    loader = DataLoader(ds, FixedBatchSampler(len(ds), 2, seed=1), collator,
                        num_workers=0)
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    trainer = F5Trainer(
        config=cfg, model=model, train_loader=loader,
        log_dir=str(tmp_path / "logs"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    loss = trainer.train_epoch(total_epochs=1)
    assert np.isfinite(loss)
    assert trainer.global_step == 1  # 2 batches / accum 2 → one update


def test_grad_accumulation_partial_flush(tmp_path):
    """3 microbatches at accum 2 → one full window + one partial flush."""
    from oron_tts_tpu.train.trainer import F5Trainer

    cfg = dict(TINY_CFG, grad_accumulation_steps=2)
    ds = _synthetic_dataset(6)
    collator = TTSCollator(pad_to_multiple=64)
    loader = DataLoader(ds, FixedBatchSampler(len(ds), 2, seed=1,
                                              drop_last=False), collator,
                        num_workers=0)
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    trainer = F5Trainer(
        config=cfg, model=model, train_loader=loader,
        log_dir=str(tmp_path / "logs"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    loss = trainer.train_epoch(total_epochs=1)
    assert np.isfinite(loss)
    assert trainer.global_step == 2  # full window + partial flush


def test_grad_accumulation_poisoned_window_skipped(tmp_path):
    """A non-finite microbatch loss freezes the WHOLE window on device
    (the host mel guard is bypassed here to exercise the device guard —
    on multi-host pods it is the only guard, trainer.train_epoch)."""
    import jax

    from oron_tts_tpu.train.trainer import F5Trainer

    cfg = dict(TINY_CFG, grad_accumulation_steps=2)
    ds = _synthetic_dataset(4)
    collator = TTSCollator(pad_to_multiple=64)
    good = collator([ds[0], ds[1]])
    bad = {k: np.asarray(v).copy() for k, v in good.items()}
    bad["mel"][0, 0, 0] = np.inf

    model = F5TTS.from_config(F5Config.from_dict(cfg))
    trainer = F5Trainer(
        config=cfg, model=model, train_loader=[good] * 2,
        log_dir=str(tmp_path / "logs"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    before = jax.tree_util.tree_map(np.asarray, trainer.state.params)

    rng = jax.random.PRNGKey(0)
    acc = trainer._zero_accum(trainer.state.params)
    acc = trainer._accum_step(acc, trainer.state.params, bad, rng)
    acc = trainer._accum_step(acc, trainer.state.params, good, rng)
    assert not bool(np.asarray(acc["all_finite"]))
    assert int(np.asarray(acc["n_finite"])) == 1
    trainer.state, metrics = trainer._apply_accum(trainer.state, acc)
    assert not bool(np.asarray(metrics["ok"]))
    after = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)  # state frozen
    assert int(np.asarray(trainer.state.step)) == 0

    # a clean window DOES move params
    acc = trainer._zero_accum(trainer.state.params)
    acc = trainer._accum_step(acc, trainer.state.params, good, rng)
    acc = trainer._accum_step(acc, trainer.state.params, good,
                              jax.random.PRNGKey(1))
    assert bool(np.asarray(acc["all_finite"]))
    trainer.state, metrics = trainer._apply_accum(trainer.state, acc)
    assert bool(np.asarray(metrics["ok"]))
    assert int(np.asarray(trainer.state.step)) == 1


def test_nonfinite_batch_skipped(tmp_path):
    from oron_tts_tpu.train.trainer import F5Trainer

    ds = _synthetic_dataset(4)
    collator = TTSCollator(pad_to_multiple=64)

    class PoisonLoader:
        dataset = ds

        def __len__(self):
            return 2

        def __iter__(self):
            good = collator([ds[0], ds[1]])
            bad = {k: v.copy() for k, v in good.items()}
            bad["mel"][0, 0, 0] = np.nan
            yield bad
            yield good

    model = F5TTS.from_config(F5Config.from_dict(TINY_CFG))
    trainer = F5Trainer(
        config=TINY_CFG, model=model, train_loader=PoisonLoader(),
        log_dir=str(tmp_path / "logs"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    loss = trainer.train_epoch(total_epochs=1)
    assert trainer.global_step == 1  # poisoned batch skipped
    assert np.isfinite(loss)


def test_lr_schedule_shape():
    from oron_tts_tpu.train.trainer import make_lr_schedule

    sched = make_lr_schedule(1e-4, warmup_steps=10, total_steps=100)
    assert float(sched(0)) == pytest.approx(1e-8, rel=0.1)
    assert float(sched(10)) == pytest.approx(1e-4, rel=0.01)
    assert float(sched(100)) == pytest.approx(1e-6, rel=0.1)
    # monotone decay after warmup
    assert float(sched(50)) < float(sched(11))


def test_best_checkpoint_written_between_save_intervals(tmp_path):
    """A best-val epoch that does not land on a save_interval boundary must
    still materialize f5tts_best.npz (the reference loses it forever)."""
    from oron_tts_tpu.train.trainer import F5Trainer

    ds = _synthetic_dataset(n=3)
    collator = TTSCollator(pad_to_multiple=64)
    loader = DataLoader(ds, FixedBatchSampler(len(ds), 3, seed=1), collator,
                        num_workers=0)
    val_loader = DataLoader(ds, FixedBatchSampler(len(ds), 3, shuffle=False,
                                                  drop_last=False),
                            collator, num_workers=0)
    model = F5TTS.from_config(F5Config.from_dict(TINY_CFG))
    trainer = F5Trainer(
        config=TINY_CFG, model=model, train_loader=loader,
        val_loader=val_loader, log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # epoch 1 of 1 with save_interval=5: 1 % 5 != 0, no step checkpoint —
    # but the (necessarily best) first validation must write the best file
    trainer.train(num_epochs=1, save_interval=5)
    ckpt = tmp_path / "ckpt"
    assert (ckpt / "f5tts_best.npz").exists()
    assert not list(ckpt.glob("f5tts_step_*.npz"))
    # the best file resumes (carries step/epoch/best_val and param trees)
    model2 = F5TTS.from_config(F5Config.from_dict(TINY_CFG))
    trainer2 = F5Trainer(
        config=TINY_CFG, model=model2, train_loader=loader, val_loader=None,
        log_dir=str(tmp_path / "logs2"), checkpoint_dir=str(ckpt),
    )
    trainer2.load_checkpoint(load_best=True)
    assert trainer2.epoch == 1
    assert np.isfinite(trainer2._best_val)


def test_best_checkpoint_opt_out(tmp_path):
    """save_best_between_intervals: false suppresses the off-interval best
    write (configs/bench_e2e.yaml: the ~6 GB Base device->host fetch every
    improving epoch would dominate tunnel-side timing runs)."""
    from oron_tts_tpu.train.trainer import F5Trainer

    ds = _synthetic_dataset(n=3)
    collator = TTSCollator(pad_to_multiple=64)
    loader = DataLoader(ds, FixedBatchSampler(len(ds), 3, seed=1), collator,
                        num_workers=0)
    val_loader = DataLoader(ds, FixedBatchSampler(len(ds), 3, shuffle=False,
                                                  drop_last=False),
                            collator, num_workers=0)
    model = F5TTS.from_config(F5Config.from_dict(TINY_CFG))
    cfg = dict(TINY_CFG, save_best_between_intervals=False)
    trainer = F5Trainer(
        config=cfg, model=model, train_loader=loader,
        val_loader=val_loader, log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer.train(num_epochs=1, save_interval=5)
    ckpt = tmp_path / "ckpt"
    assert not (ckpt / "f5tts_best.npz").exists()
    assert not list(ckpt.glob("f5tts_step_*.npz"))


def test_sigterm_preemption_checkpoint(tmp_path):
    """SIGTERM mid-epoch → emergency checkpoint on disk, TrainingPreempted
    raised at the next metrics window, and the checkpoint resumes."""
    import os
    import signal

    from oron_tts_tpu.train.trainer import F5Trainer, TrainingPreempted

    ds = _synthetic_dataset()
    collator = TTSCollator(pad_to_multiple=64)
    loader = DataLoader(ds, FixedBatchSampler(len(ds), 3, seed=1), collator,
                        num_workers=0)
    model = F5TTS.from_config(F5Config.from_dict(TINY_CFG))
    trainer = F5Trainer(
        config=TINY_CFG, model=model, train_loader=loader,
        log_dir=str(tmp_path / "logs"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    prev = signal.getsignal(signal.SIGTERM)
    try:
        trainer.install_signal_handlers()
        os.kill(os.getpid(), signal.SIGTERM)  # the real delivery path
        with pytest.raises(TrainingPreempted):
            trainer.train_epoch(total_epochs=2)
    finally:
        signal.signal(signal.SIGTERM, prev)
    ckpts = list((tmp_path / "ckpt").glob("f5tts_step_*.npz"))
    assert ckpts, "emergency checkpoint missing"

    model2 = F5TTS.from_config(F5Config.from_dict(TINY_CFG))
    trainer2 = F5Trainer(
        config=TINY_CFG, model=model2, train_loader=loader,
        log_dir=str(tmp_path / "logs2"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer2.load_checkpoint()
    assert trainer2.global_step == trainer.global_step
    # a fresh trainer without the flag continues normally
    assert np.isfinite(trainer2.train_epoch(total_epochs=2))
