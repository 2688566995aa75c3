"""Two-process multi-host test (VERDICT r1 #6).

Launches 2 real OS processes that join a jax.distributed Gloo rendezvous
(2 virtual CPU devices each, 4 global), run one fused train step through
``shard_batch``'s make_array_from_process_local_data path on a 4x1 data
mesh, and assert both hosts observe the SAME loss — equal to a
single-process run over the identical global batch. Also covers the
wrap-around host-shard helper used by scripts/train.py.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from oron_tts_tpu.parallel.mesh import host_shard_wraparound

REPO_ROOT = Path(__file__).resolve().parent.parent


def test_host_shard_wraparound():
    idx = list(range(10))
    s0 = host_shard_wraparound(idx, 4, 0)
    s1 = host_shard_wraparound(idx, 4, 1)
    s2 = host_shard_wraparound(idx, 4, 2)
    s3 = host_shard_wraparound(idx, 4, 3)
    # equal counts (deadlock guard) and full coverage
    assert len(s0) == len(s1) == len(s2) == len(s3) == 3
    assert set(s0) | set(s1) | set(s2) | set(s3) == set(idx)
    # wrap-around pads from the front
    assert sorted(s0 + s1 + s2 + s3) == sorted(idx + [0, 1])
    # single host: identity
    assert host_shard_wraparound(idx, 1, 0) == idx
    # already-even shards get no padding
    assert sorted(sum((host_shard_wraparound(idx, 2, p) for p in range(2)), []
                      )) == idx


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _expected_single_process_loss() -> dict[str, float]:
    """Same step on this process's 8-virtual-device runtime (4-device mesh)."""
    import jax

    from oron_tts_tpu.models.cfm import CFM, CFMConfig
    from oron_tts_tpu.models.dit import DiT
    from oron_tts_tpu.parallel.mesh import make_mesh, shard_batch
    from oron_tts_tpu.train.trainer import (
        TrainState,
        make_eval_step,
        make_lr_schedule,
        make_optimizer,
        make_train_step,
    )
    from tests.multihost_case import TINY, build_state, global_batch

    model = DiT(**TINY)
    cfm = CFM(model, CFMConfig(n_mels=TINY["mel_dim"]))
    tx = make_optimizer(make_lr_schedule(1e-3, warmup_steps=2, total_steps=10))
    state = build_state(model, tx, TrainState)
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    batch = shard_batch(mesh, global_batch())
    step = make_train_step(cfm, tx, ema_decay=0.999)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
    val = make_eval_step(cfm)(new_state.params, batch)
    return {
        "loss": float(metrics["loss"]),
        "grad_norm": float(metrics["grad_norm"]),
        "val_loss": float(val),
    }


def test_global_batch_schedule_cross_host_consistency():
    """Every host derives the same plan; slices cover each global batch."""
    from oron_tts_tpu.data.dataset import GlobalBatchSchedule, round_up

    rng = np.random.default_rng(3)
    frames = [int(f) for f in rng.integers(80, 700, size=23)]
    hosts = [
        GlobalBatchSchedule(frames, num_hosts=2, host_id=h,
                            frames_threshold=1500, max_samples=6,
                            pad_to_multiple=64, rows_multiple_per_host=2,
                            seed=5)
        for h in range(2)
    ]
    for epoch in (0, 1):
        for s in hosts:
            s.set_epoch(epoch)
        entries = [list(s) for s in hosts]
        assert len(entries[0]) == len(entries[1]) == len(hosts[0])
        covered = set()
        for (idx0, kw0), (idx1, kw1) in zip(*entries):
            assert kw0 == kw1  # globally agreed pad targets
            assert len(idx0) == len(idx1) == kw0["pad_rows_to"]
            batch = idx0 + idx1
            assert kw0["pad_t_to"] == round_up(
                max(frames[i] for i in batch), 64)
            assert kw0["pad_t_to"] % 64 == 0
            # global rows divide num_hosts * rows_multiple
            assert (len(batch)) % 4 == 0
            covered.update(batch)
        assert covered == set(range(len(frames)))  # nothing dropped
    # epoch seed changes the order but not the membership
    hosts[0].set_epoch(0)
    order0 = [kw for _, kw in hosts[0]]
    hosts[0].set_epoch(1)
    order1 = [kw for _, kw in hosts[0]]
    assert order0 != order1


def test_global_batch_schedule_fixed_mode():
    from oron_tts_tpu.data.dataset import GlobalBatchSchedule

    frames = [100, 200, 300, 400, 500]
    s0 = GlobalBatchSchedule(frames, num_hosts=2, host_id=0, batch_size=2,
                             shuffle=False, seed=0)
    s1 = GlobalBatchSchedule(frames, num_hosts=2, host_id=1, batch_size=2,
                             shuffle=False, seed=0)
    e0, e1 = list(s0), list(s1)
    assert len(e0) == len(e1) == len(s0) == 3
    # tiny final batch (1 row) wrap-pads so both hosts still hold one row
    assert len(e0[-1][0]) == len(e1[-1][0]) == 1
    with pytest.raises(ValueError):
        GlobalBatchSchedule(frames, num_hosts=2, host_id=0)  # no mode picked
    with pytest.raises(ValueError):
        GlobalBatchSchedule(frames, num_hosts=2, host_id=2, batch_size=2)


def test_collator_scheduled_pad_targets():
    from oron_tts_tpu.data.dataset import TTSCollator

    item = {
        "mel": np.ones((4, 100), np.float32),
        "text_ids": np.arange(100, dtype=np.int32),
        "mask": np.ones(100, bool),
    }
    c = TTSCollator(pad_to_multiple=64, n_mels=4)
    out = c([item], pad_t_to=192, pad_rows_to=3)
    assert out["mel"].shape == (3, 4, 192)
    assert out["mel_lengths"][0] == 100 and (out["mel_lengths"][1:] == 0).all()
    # crop: scheduled bucket shorter than the item (frame-estimate off-by-one)
    out = c([item], pad_t_to=96, pad_rows_to=1)
    assert out["mel"].shape == (1, 4, 96)
    assert out["mel_lengths"][0] == 96
    # all-failed batch still emits the agreed (pure padding) shape
    out = c([], pad_t_to=64, pad_rows_to=2)
    assert out["mel"].shape == (2, 4, 64)
    assert (out["mel_lengths"] == 0).all()


def test_two_process_trainer_epoch(tmp_path):
    """VERDICT r2 #1 'done' criterion: two hosts holding DIFFERENT-length
    samples run a full epoch incl. validation + checkpoint — identical
    val_loss/is_best on both hosts, exactly one checkpoint/TB writer, and
    no global-shape error."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable,
             str(REPO_ROOT / "tests" / "_multihost_trainer_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO_ROOT),
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"trainer worker failed:\n{out[-4000:]}"

    r = [json.loads((tmp_path / f"p{i}.json").read_text()) for i in range(2)]
    # batch plan and losses agree exactly (global arrays are replicated)
    assert r[0]["n_train_batches"] == r[1]["n_train_batches"]
    assert r[0]["global_step"] == r[1]["global_step"] > 0
    np.testing.assert_allclose(r[0]["val_loss"], r[1]["val_loss"],
                               rtol=1e-6, atol=1e-7)
    assert r[0]["is_best"] == r[1]["is_best"] is True
    assert np.isfinite(r[0]["avg_loss"]) and np.isfinite(r[1]["avg_loss"])
    # rank-0 exclusivity: one TB writer, one checkpoint writer
    assert r[0]["writer_active"] and not r[1]["writer_active"]
    assert r[0]["saved_path"] is not None and r[1]["saved_path"] is None
    assert r[0]["ckpt_files"] and not r[1]["ckpt_files"]
    # best checkpoint exists on rank 0 (is_best was True)
    assert any("best" in f for f in r[0]["ckpt_files"])
    # resume broadcast: rank 1 had NO checkpoint file yet resumes with
    # rank 0's exact step/epoch/best_val and weights
    for i in range(2):
        assert r[i]["resume_step"] == r[0]["global_step"]
        assert r[i]["resume_epoch"] == 1
        np.testing.assert_allclose(r[i]["resume_best_val"], r[0]["val_loss"],
                                   rtol=1e-6)
        np.testing.assert_allclose(r[i]["resume_checksum"],
                                   r[0]["trained_checksum"], rtol=1e-6)


def test_two_process_train_step(tmp_path):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO_ROOT / "tests" / "_multihost_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO_ROOT),
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = [
        json.loads((tmp_path / f"p{pid}.json").read_text()) for pid in range(2)
    ]
    # both hosts observe the identical global loss (it's one replicated array)
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["val_loss"] == results[1]["val_loss"]
    assert results[0]["ok"] and results[1]["ok"]
    assert results[0]["step"] == results[1]["step"] == 1

    expected = _expected_single_process_loss()
    # cross-process Gloo reduction vs single-process: same math, tolerance
    # for collective summation order
    np.testing.assert_allclose(results[0]["loss"], expected["loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results[0]["val_loss"], expected["val_loss"],
                               rtol=1e-5, atol=1e-6)
