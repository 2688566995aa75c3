"""Subprocess worker for the two-process TRAINER multi-host test.

Usage: python _multihost_trainer_worker.py <pid> <nproc> <port> <outdir>

Each process gets 2 virtual CPU devices (4 global) and joins a Gloo
rendezvous. Both build the IDENTICAL global synthetic dataset whose clips
have DIFFERENT durations, so per-host local padding would produce
different T-buckets — the exact failure mode GlobalBatchSchedule exists to
prevent (VERDICT r2 #1/#2). Each runs a real F5Trainer epoch (train +
validation + best tracking + checkpoint) over a 4x1 data mesh with its own
checkpoint/log dirs, then reports val_loss / is_best / writer & checkpoint
activity to <outdir>/p<pid>.json.
"""

import json
import os
import sys
from pathlib import Path

pid, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402

from oron_tts_tpu.config import F5Config  # noqa: E402
from oron_tts_tpu.data.dataset import (  # noqa: E402
    GlobalBatchSchedule,
    TTSCollator,
    TTSDataset,
    frames_for_duration,
)
from oron_tts_tpu.data.loader import DataLoader  # noqa: E402
from oron_tts_tpu.models.f5tts import F5TTS  # noqa: E402
from oron_tts_tpu.parallel.mesh import make_mesh  # noqa: E402
from oron_tts_tpu.train.trainer import F5Trainer  # noqa: E402

assert jax.process_count() == nproc and jax.device_count() == 2 * nproc

CFG = {
    "sample_rate": 24000, "n_fft": 1024, "hop_length": 256, "n_mels": 100,
    "learning_rate": 1e-3, "warmup_steps": 2, "num_epochs": 1,
    "ema_decay": 0.999, "max_grad_norm": 1.0, "grad_accumulation_steps": 1,
    "use_tqdm": False, "log_interval": 1, "save_interval": 1,
    "max_checkpoints": 2, "audio_sample_interval": 1000, "seed": 0,
    # ZeRO-1 across the cross-PROCESS data axis: save_checkpoint /
    # resume-broadcast must all-gather the moments (collective on every
    # host) before rank-0 writes — the exact multi-host crash path
    "shard_opt_states": True,
    "model": {
        "vocab_size": 65, "dim": 64, "depth": 2, "heads": 2, "ff_mult": 2,
        "text_dim": 32, "conv_layers": 2, "p_dropout": 0.0,
    },
}
SR = CFG["sample_rate"]


def synthetic_dataset(n=6):
    """Identical on every host (seeded); varying durations by design."""
    rng = np.random.default_rng(0)
    arrays, texts = [], []
    for i in range(n):
        dur = 1.0 + 0.35 * i  # 1.0s .. 2.75s — different T per sample
        t = np.arange(int(SR * dur)) / SR
        freq = 180 + 30 * i + 10 * rng.random()
        arrays.append((0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32))
        texts.append("сайн байна уу тавтай морилно уу")
    ds = TTSDataset(audio_arrays=arrays, texts=texts, sample_rate=SR)
    ds.durations = [len(a) / SR for a in arrays]
    return ds


ds = synthetic_dataset()
frames = [frames_for_duration(d, SR, CFG["hop_length"]) for d in ds.durations]
mesh = make_mesh(n_data=jax.device_count(), n_model=1)
dp_size = jax.device_count()
rows_mult = max(1, dp_size // nproc)

collator = TTSCollator(pad_to_multiple=64, n_mels=CFG["n_mels"])
common = dict(num_hosts=nproc, host_id=pid, pad_to_multiple=64,
              rows_multiple_per_host=rows_mult, seed=0)
train_sched = GlobalBatchSchedule(frames, batch_size=2, **common)
val_sched = GlobalBatchSchedule(frames, batch_size=2, shuffle=False, **common)
train_loader = DataLoader(ds, train_sched, collator, num_workers=0)
val_loader = DataLoader(ds, val_sched, collator, num_workers=0)

model = F5TTS.from_config(F5Config.from_dict(CFG))
ckpt_dir = Path(outdir) / f"ckpt{pid}"   # PER-PROCESS dirs: proves rank-0-only writes
log_dir = Path(outdir) / f"logs{pid}"
trainer = F5Trainer(
    config=CFG, model=model, train_loader=train_loader, val_loader=val_loader,
    log_dir=str(log_dir), checkpoint_dir=str(ckpt_dir), mesh=mesh,
)

avg_loss = trainer.train_epoch(total_epochs=1)
val_loss = trainer.validate(use_ema=True)
is_best = 0 < val_loss < trainer._best_val
if is_best:
    trainer._best_val = val_loss
saved = trainer.save_checkpoint(is_best=is_best, loss=avg_loss)

ckpt_files = sorted(p.name for p in ckpt_dir.glob("*.npz"))

# resume with NON-shared checkpoint dirs: only rank 0 has a file; rank 1
# must receive rank 0's state via the load_checkpoint broadcast
model2 = F5TTS.from_config(F5Config.from_dict(CFG))
trainer2 = F5Trainer(
    config=CFG, model=model2, train_loader=train_loader,
    val_loader=val_loader, log_dir=str(Path(outdir) / f"logs2_{pid}"),
    checkpoint_dir=str(ckpt_dir), mesh=mesh,
)
trainer2.load_checkpoint()


def checksum(tree) -> float:
    import jax

    return float(sum(
        np.abs(np.asarray(x.addressable_data(0)
                          if hasattr(x, "addressable_data") else x)).sum()
        for x in jax.tree_util.tree_leaves(tree)
    ))


out = {
    "avg_loss": float(avg_loss),
    "val_loss": float(val_loss),
    "is_best": bool(is_best),
    "global_step": trainer.global_step,
    "writer_active": trainer.writer is not None,
    "saved_path": str(saved) if saved else None,
    "ckpt_files": ckpt_files,
    "n_train_batches": len(train_sched),
    "resume_step": trainer2.global_step,
    "resume_epoch": trainer2.epoch,
    "resume_best_val": trainer2._best_val,
    "resume_checksum": checksum(trainer2.state.params),
    "trained_checksum": checksum(trainer.state.params),
}
Path(outdir, f"p{pid}.json").write_text(json.dumps(out))
print(f"trainer worker {pid} done: {out}", flush=True)
