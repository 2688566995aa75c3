"""Subprocess worker for the two-process multi-host test.

Usage: python _multihost_worker.py <process_id> <num_processes> <port> <outdir>

Each process gets 2 virtual CPU devices (4 global), joins a Gloo-backed
jax.distributed rendezvous, builds identical tiny CFM params from seed 0,
assembles its local half of a deterministic global batch through
``shard_batch`` (the ``make_array_from_process_local_data`` path), runs ONE
fused train step over a 4x1 data mesh, and writes its view of the metrics
to <outdir>/p<pid>.json for the parent test to compare.
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

from oron_tts_tpu.models.cfm import CFM, CFMConfig  # noqa: E402
from oron_tts_tpu.models.dit import DiT  # noqa: E402
from oron_tts_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: E402
from oron_tts_tpu.train.trainer import (  # noqa: E402
    TrainState,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)
from tests.multihost_case import (  # noqa: E402
    TINY, build_state, global_batch, local_slice,
)

assert jax.process_count() == nproc and jax.device_count() == 2 * nproc

model = DiT(**TINY)
cfm = CFM(model, CFMConfig(n_mels=TINY["mel_dim"]))
schedule = make_lr_schedule(1e-3, warmup_steps=2, total_steps=10)
tx = make_optimizer(schedule)
state = build_state(model, tx, TrainState)

mesh = make_mesh(n_data=jax.device_count(), n_model=1)
from oron_tts_tpu.parallel.mesh import param_shardings, replicated  # noqa: E402

shardings = TrainState(
    params=param_shardings(mesh, state.params),
    opt_state=jax.tree_util.tree_map(
        lambda _: replicated(mesh), state.opt_state
    ),
    ema_params=param_shardings(mesh, state.params),
    step=replicated(mesh),
    ema_updates=replicated(mesh),
)
# trainer._apply_mesh uses jax.device_put; on multi-host this requires the
# same host-local value on every process, which seed-0 init guarantees
state = jax.device_put(state, shardings)

batch = global_batch()
local = local_slice(batch, pid, nproc)
sharded = shard_batch(mesh, local)

step = make_train_step(cfm, tx, ema_decay=0.999)
new_state, metrics = step(state, sharded, jax.random.PRNGKey(7))

eval_step = make_eval_step(cfm)
val_loss = eval_step(new_state.params, shard_batch(mesh, local))


def scalar(x) -> float:
    return float(np.asarray(x.addressable_data(0)))


out = {
    "loss": scalar(metrics["loss"]),
    "grad_norm": scalar(metrics["grad_norm"]),
    "ok": bool(scalar(metrics["ok"])),
    "val_loss": scalar(val_loss),
    "step": scalar(new_state.step),
}
Path(outdir, f"p{pid}.json").write_text(json.dumps(out))
print(f"worker {pid} done: {out}", flush=True)
