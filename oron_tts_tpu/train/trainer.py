"""F5 trainer: optax AdamW + warmup-cosine, pytree EMA, non-finite guards.

Behavior parity with reference /root/reference/src/training/trainer.py:
single-optimizer AdamW(wd=0.01) with LinearLR warmup (start factor 1e-4) into
cosine annealing (eta_min 1e-6), EMA decay 0.9999 with torch_ema's
num-updates ramp, gradient clipping, skip-batch guards on non-finite
mel/loss/grad-norm, validation under EMA weights each epoch, best-val
checkpoint tracking, TensorBoard scalars with the reference's names, audio
diagnostics every ``audio_sample_interval`` epochs, rotating checkpoints and
optional HF-hub mirroring.

TPU-native: the whole optimizer step is one jitted+donated function; data
parallelism and tensor parallelism come from NamedShardings over a
("data", "model") mesh — XLA inserts the gradient psum that DDP/NCCL did in
the reference. bf16 compute needs no GradScaler.
"""

from __future__ import annotations

import contextlib
import logging
import math
import os
import sys
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from oron_tts_tpu.models.f5tts import F5TTS
from oron_tts_tpu.train.checkpoint import CheckpointManager


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray  # int32 scalar
    ema_updates: jnp.ndarray  # int32 scalar


def make_lr_schedule(
    lr: float, warmup_steps: int, total_steps: int, eta_min: float = 1e-6,
    start_factor: float = 1e-4,
) -> optax.Schedule:
    warmup = optax.linear_schedule(
        init_value=lr * start_factor, end_value=lr, transition_steps=warmup_steps
    )
    cosine = optax.cosine_decay_schedule(
        init_value=lr,
        decay_steps=max(total_steps - warmup_steps, 1),
        alpha=eta_min / lr,
    )
    return optax.join_schedules([warmup, cosine], boundaries=[warmup_steps])


def make_optimizer(
    schedule: optax.Schedule,
    betas: tuple[float, float] = (0.9, 0.999),
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    mu_dtype: Any | None = None,
) -> optax.GradientTransformation:
    """AdamW with warmup-cosine schedule (reference trainer.py:76-96).

    ``mu_dtype=jnp.bfloat16`` halves the first-moment memory (~0.9 GB at
    Base scale) — useful headroom when training without activation
    rematerialization on a 16 GB chip (docs/KERNELS.md).
    """
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, b1=betas[0], b2=betas[1],
                    weight_decay=weight_decay, mu_dtype=mu_dtype),
    )


def _global_norm(tree: Any) -> jnp.ndarray:
    return optax.global_norm(tree)


def _guarded_update(
    state: TrainState,
    grads: Any,
    tx: optax.GradientTransformation,
    ema_decay: float,
    extra_ok: jnp.ndarray | bool = True,
) -> tuple[TrainState, jnp.ndarray, jnp.ndarray]:
    """Apply optimizer + EMA with the non-finite skip guard.

    Shared by the fused train step and the grad-accumulation apply step:
    a non-finite grad norm (or caller-provided condition) freezes every
    state field, mirroring the reference's skip-optimizer-step guard
    (trainer.py:191-204). Returns (new_state, grad_norm, ok).
    """
    grad_norm = _global_norm(grads)
    ok = jnp.isfinite(grad_norm) & jnp.asarray(extra_ok)

    safe_grads = jax.tree_util.tree_map(
        lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
    )
    updates, new_opt = tx.update(safe_grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    # torch_ema-style num-updates ramp: decay = min(d, (1+n)/(10+n))
    n = state.ema_updates + 1
    decay = jnp.minimum(ema_decay, (1.0 + n) / (10.0 + n))
    new_ema = jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, state.ema_params, new_params
    )

    def pick(new, old):
        return jax.tree_util.tree_map(lambda a, b: jnp.where(ok, a, b), new, old)

    new_state = TrainState(
        params=pick(new_params, state.params),
        opt_state=pick(new_opt, state.opt_state),
        ema_params=pick(new_ema, state.ema_params),
        step=state.step + jnp.where(ok, 1, 0),
        ema_updates=state.ema_updates + jnp.where(ok, 1, 0),
    )
    return new_state, grad_norm, ok


def _train_step_fn(cfm: Any, tx: optax.GradientTransformation, ema_decay: float):
    """Raw (unjitted) fused loss+grad+update+EMA step with skip guard."""

    def step_fn(state: TrainState, batch: dict[str, jnp.ndarray], rng: jax.Array):
        def loss_fn(params):
            return cfm.loss(
                {"params": params},
                batch["mel"],
                batch["text_ids"],
                batch["mel_lengths"],
                rng,
                train=True,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state, grad_norm, ok = _guarded_update(
            state, grads, tx, ema_decay, extra_ok=jnp.isfinite(loss)
        )
        metrics = {"loss": loss, "grad_norm": grad_norm, "ok": ok}
        return new_state, metrics

    return step_fn


def make_train_step(cfm: Any, tx: optax.GradientTransformation, ema_decay: float,
                    out_shardings: Any | None = None):
    """Fused loss+grad+update+EMA step with non-finite skip guard.

    ``out_shardings`` (mesh runs) pins the output TrainState to the
    canonical placement (params/EMA per TP rules, moments per ZeRO-1
    specs, metrics replicated). Without it GSPMD propagation is free to
    leave the updated params sharded over ``data`` under ZeRO-1 — the
    all-gather merely moves to the next step's forward, but on a pod the
    state becomes non-addressable and every host-side read
    (checkpointing, diagnostics) breaks.
    """
    kw = {} if out_shardings is None else {"out_shardings": out_shardings}
    return jax.jit(_train_step_fn(cfm, tx, ema_decay), donate_argnums=(0,), **kw)


def _persistent_cache_api():
    """The private JAX compilation-cache API the AOT path depends on.

    Returns the module when every required attribute is present, else
    ``None``. Centralised so a JAX upgrade that moves/renames the private
    surface is detected in ONE place (and pinned by
    tests/test_aot_cache_bypass.py) instead of silently changing behavior.
    """
    try:
        from jax._src import compilation_cache as _cc
    except Exception:
        return None
    if not callable(getattr(_cc, "reset_cache", None)):
        return None
    if not hasattr(jax.config, "jax_enable_compilation_cache"):
        return None
    return _cc


@contextlib.contextmanager
def persistent_cache_disabled():
    """Disable the persistent compilation cache for the enclosed compiles.

    Needed because a deserialized AUTO-layout donated executable loses the
    output→input aliasing contract — its first call succeeds but the
    aliased feedback call (step outputs fed back as donated inputs) dies
    with a device-side INVALID_ARGUMENT (measured on v5e; docs/KERNELS.md
    "persistent-cache bypass"). Fresh compiles never exhibit this.

    Raises ``RuntimeError`` if the private JAX API this requires
    (``jax._src.compilation_cache.reset_cache``) is gone — callers must
    treat that as "AOT unavailable" and fall back to plain jit rather
    than compile through the cache and risk the device-side crash.

    NOT thread-safe: flips the process-global
    ``jax_enable_compilation_cache`` flag, so any compile issued
    concurrently from another thread while inside this context would also
    skip the cache (benign) — but do not rely on cached compiles landing
    during the window.
    """
    _cc = _persistent_cache_api()
    if _cc is None:
        raise RuntimeError(
            "jax._src.compilation_cache.reset_cache is unavailable in this "
            "JAX version — cannot safely bypass the persistent cache for "
            "the AUTO-layout donated compile (a cached hit would crash at "
            "the aliased feedback call). Falling back to plain jit."
        )
    cache_was = bool(jax.config.jax_enable_compilation_cache)
    jax.config.update("jax_enable_compilation_cache", False)
    # is_cache_used() memoizes its decision once per process, so the flag
    # flip alone is ignored after any earlier compile — reset_cache()
    # drops the memo so the flag is actually re-read
    _cc.reset_cache()
    try:
        yield
    finally:
        jax.config.update("jax_enable_compilation_cache", cache_was)
        _cc.reset_cache()  # re-enable for subsequent compiles


def _relayout_state(state: Any, state_fmt: Any) -> Any:
    """Relayout a TrainState into the AOT-chosen formats at ~1× HBM.

    ``jax.device_put(state, state_fmt)`` holds the full source tree alive
    until every leaf is relaid out, so at Base scale the relayout
    transiently needs TWO ~7 GB state copies — which OOMed the round-4
    driver bench when serve-phase allocator residue still fragmented HBM
    (BENCH_r04 rc=1 at the old trainer.py:285). Here each source leaf is
    deleted as soon as its relaid copy is dispatched (PJRT holds a usage
    reference on the source until the in-flight copy completes, so the
    delete is safe even on backends whose block_until_ready is lazy),
    capping peak overhead at roughly one leaf. A leaf whose device copy
    still hits RESOURCE_EXHAUSTED falls back to a host round-trip for
    that leaf only (fetch → free device source → put with the format).

    CONSUMES the input state: on return (or on a non-OOM error mid-way)
    the caller's original device buffers are gone — donation semantics,
    matching how every caller immediately rebinds the returned state.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    fmts = treedef.flatten_up_to(state_fmt)
    # a buffer aliased at several leaves must not be deleted while later
    # leaves still need it — count references and free after the LAST
    # occurrence (freeing never would break the ~1-leaf peak-overhead
    # contract for aliased trees)
    counts: dict[int, int] = {}
    for leaf in leaves:
        counts[id(leaf)] = counts.get(id(leaf), 0) + 1
    out = []
    for leaf, fmt in zip(leaves, fmts):
        counts[id(leaf)] -= 1
        last_use = counts[id(leaf)] == 0
        try:
            new = jax.device_put(leaf, fmt)
        except Exception as exc:  # noqa: BLE001 — re-raised unless OOM
            if "RESOURCE_EXHAUSTED" not in str(exc):
                raise
            host = jax.device_get(leaf)
            if last_use and hasattr(leaf, "delete"):
                leaf.delete()
            new = jax.device_put(host, fmt)
        else:
            if new is not leaf and last_use and hasattr(leaf, "delete"):
                leaf.delete()
        out.append(new)
    return jax.tree_util.tree_unflatten(treedef, out)


def compile_train_step_auto(
    cfm: Any, tx: optax.GradientTransformation, ema_decay: float,
    state: TrainState, batch: dict[str, Any], rng: jax.Array,
    state_format: Any | None = None,
):
    """AOT-compile the donated train step with AUTO layouts (one compile).

    A donated jit step normally compiles TWICE: once for default-layout
    inputs, then again on the first call whose inputs alias the previous
    outputs (different layouts) — 52-315 s at Base scale (docs/KERNELS.md
    "Donated-buffer second compile", VERDICT r2 #4). Compiling with
    ``Layout.AUTO`` lets XLA pick ONE layout for the donated state's
    input and output, so the aliased feedback call hits the same
    executable. Returns ``(step, state, state_format)`` with ``state``
    re-laid-out to the compiled input format; pass ``state_format`` back
    in when compiling further batch shapes so every executable shares the
    state layout (no ping-ponging).
    """
    from jax.experimental.layout import Format, Layout

    auto = Format(Layout.AUTO)
    in_fmts = (state_format if state_format is not None else auto, auto, auto)
    # Follow-up compiles (new bucket shape, state_format given) must pin
    # the CONCRETE state format on the OUTPUT side too, not AUTO: jax
    # normalizes an explicit input layout that equals the default to None
    # internally, and a donated None-layout input paired with an AUTO
    # output fails mlir's donation check ("Input layout being donated was
    # None while output layout was AUTO", jax 0.9, measured on v5e at the
    # eval corpus' second batch bucket). Matching in/out formats also IS
    # the invariant state_format exists for: every executable shares one
    # state layout, so interleaved buckets never relayout the state.
    out_fmts = (auto if state_format is None else state_format, auto)
    # TPU requires abstract avals with Layout.AUTO (concrete arrays carry
    # a committed layout and are rejected)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        (state, batch, rng),
    )
    # bypass the persistent compilation cache for THIS compile (see
    # persistent_cache_disabled for why a cached hit would crash); raises
    # if the private API is gone, which _get_train_step turns into a loud
    # plain-jit fallback
    with persistent_cache_disabled():
        compiled = jax.jit(
            _train_step_fn(cfm, tx, ema_decay), donate_argnums=(0,),
            in_shardings=in_fmts, out_shardings=out_fmts,
        ).lower(*abstract).compile()
    state_fmt, batch_fmt, rng_fmt = compiled.input_formats[0]
    # NOTE: must stay jax.device_put (per-leaf relayout) — compiling one
    # jitted identity with out_shardings=state_fmt looks cheaper (41 tiny
    # _identity_fn compiles become 1) but XLA normalizes the requested
    # output layouts for some small conv-kernel shapes and the executable
    # then rejects the state with a layout mismatch. The per-leaf compiles
    # are persistent-cached instead (utils/cache.py write threshold 0.1 s)
    if state_format is None:
        state = _relayout_state(state, state_fmt)
    # else: the state came out of an executable whose output format IS
    # state_format (we pinned it on the out side above), so it is already
    # laid out correctly — and a redundant device_put here would issue a
    # relayout on a possibly IN-FLIGHT donated output (the trainer
    # compiles new bucket shapes mid-epoch without draining the pipeline),
    # which corrupts the device stream on v5e (INVALID_ARGUMENT at the
    # next sync; measured, see tests/test_aot_cache_bypass.py)

    def step(state: TrainState, batch: dict[str, Any], rng: jax.Array):
        if os.environ.get("ORON_AOT_DEBUG"):
            for (kp, leaf), (_, f) in zip(
                jax.tree_util.tree_leaves_with_path(batch),
                jax.tree_util.tree_leaves_with_path(batch_fmt),
            ):
                try:
                    jax.device_put(leaf, f)
                except Exception as exc:
                    print(f"AOT-DEBUG device_put failed leaf="
                          f"{jax.tree_util.keystr(kp)} shape={getattr(leaf, 'shape', None)} "
                          f"dtype={getattr(leaf, 'dtype', None)} fmt={f!r}: {exc}",
                          flush=True)
                    raise
        return compiled(
            state,
            jax.device_put(batch, batch_fmt),
            jax.device_put(rng, rng_fmt),
        )

    return step, state, state_fmt


def make_eval_step(cfm: Any):
    def eval_fn(params: Any, batch: dict[str, jnp.ndarray]):
        return cfm.loss(
            {"params": params},
            batch["mel"],
            batch["text_ids"],
            batch["mel_lengths"],
            jax.random.PRNGKey(0),
            train=False,
        )

    return jax.jit(eval_fn)


def make_zero_accum():
    """Fresh on-device gradient accumulator (zeros + window counters)."""

    @jax.jit
    def fn(params: Any):
        return {
            "grads": jax.tree_util.tree_map(jnp.zeros_like, params),
            "loss_sum": jnp.zeros((), jnp.float32),
            "n_finite": jnp.zeros((), jnp.int32),
            "all_finite": jnp.ones((), jnp.bool_),
        }

    return fn


def make_accum_step(cfm: Any):
    """Per-microbatch loss+grads accumulated ON DEVICE (VERDICT r2 #5/#6).

    The old path pulled ``float(loss)`` back per microbatch — a full host
    sync that drained the device queue exactly where the grad_accum==1 path
    had been pipelined. Here the accumulator (donated, so XLA updates it in
    place) carries summed grads, summed finite losses, and finiteness
    flags; the host reads nothing until the window's apply step, whose
    metrics drain in the same deferred windows as the fused step.
    A non-finite microbatch loss contributes nothing to the sums and trips
    ``all_finite``, which makes the apply step freeze the whole window
    (reference trainer.py:238-245 semantics: poisoned data never reaches
    the optimizer).
    """

    def fn(acc: dict, params: Any, batch: dict[str, jnp.ndarray],
           rng: jax.Array):
        def loss_fn(p):
            return cfm.loss(
                {"params": p}, batch["mel"], batch["text_ids"],
                batch["mel_lengths"], rng, train=True,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        finite = jnp.isfinite(loss)
        new_acc = {
            "grads": jax.tree_util.tree_map(
                lambda a, g: a + jnp.where(finite, g, jnp.zeros_like(g)),
                acc["grads"], grads,
            ),
            "loss_sum": acc["loss_sum"] + jnp.where(finite, loss, 0.0),
            "n_finite": acc["n_finite"] + finite.astype(jnp.int32),
            "all_finite": acc["all_finite"] & finite,
        }
        return new_acc

    return jax.jit(fn, donate_argnums=(0,))


def make_apply_accum_step(tx: optax.GradientTransformation, ema_decay: float,
                          out_shardings: Any | None = None):
    """Apply an accumulated window: mean-scale, guard, update, EMA.

    The scale comes from the on-device finite-microbatch count, so partial
    windows (end-of-epoch flush, reference trainer.py:319-327) and
    host-skipped microbatches need no special casing. ``out_shardings``
    pins the output state placement on mesh runs (see make_train_step).
    """

    def fn(state: TrainState, acc: dict):
        n = jnp.maximum(acc["n_finite"], 1)
        scale = 1.0 / n.astype(jnp.float32)
        grads = jax.tree_util.tree_map(lambda g: g * scale, acc["grads"])
        new_state, grad_norm, ok = _guarded_update(
            state, grads, tx, ema_decay, extra_ok=acc["all_finite"]
        )
        metrics = {
            "loss": acc["loss_sum"] * scale,
            "grad_norm": grad_norm,
            "ok": ok,
        }
        return new_state, metrics

    kw = {} if out_shardings is None else {"out_shardings": out_shardings}
    return jax.jit(fn, donate_argnums=(0, 1), **kw)


class TrainingPreempted(RuntimeError):
    """Raised after the emergency checkpoint when SIGTERM interrupted
    training (TPU-VM preemption / job-manager eviction). The checkpoint
    named in ``args`` is already on disk when this propagates."""


class F5Trainer:
    """Drop-in trainer facade over the functional step functions."""

    def __init__(
        self,
        config: dict[str, Any],
        model: F5TTS,
        train_loader: Any,
        val_loader: Any | None = None,
        log_dir: str = "logs",
        checkpoint_dir: str = "checkpoints",
        hub_repo_id: str | None = None,
        hub_token: str | None = None,
        hub_private: bool = False,
        hub_upload_interval: int = 1,
        mesh: Any | None = None,
    ) -> None:
        self.config = config
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.log_dir = log_dir
        self.hub_repo_id = hub_repo_id
        self.hub_token = hub_token
        self.hub_private = hub_private
        self.hub_upload_interval = max(1, hub_upload_interval)
        self._upload_count = 0
        self.mesh = mesh
        # rank-0 concept (reference trainer.py:67,98-103,124-135): exactly
        # one host writes TensorBoard, checkpoints, audio diagnostics, and
        # hub pushes; on a pod every host otherwise races the same HF repo
        self.is_main_process = jax.process_index() == 0
        # calibrated ref-free duration table (cli/train.py fits it from
        # the corpus): the in-training audio diagnostics synthesize with
        # the same duration rule inference will use
        if config.get("duration_stats") and hasattr(
            model, "set_duration_stats"
        ):
            model.set_duration_stats(config["duration_stats"])

        lr = config.get("learning_rate", 1e-4)
        betas = tuple(config.get("betas", [0.9, 0.999]))
        warmup_steps = config.get("warmup_steps", 1000)
        num_epochs = config.get("num_epochs", 500)
        self.grad_accum = max(1, config.get("grad_accumulation_steps", 1))
        steps_per_epoch = max(len(train_loader) // self.grad_accum, 1)
        total_steps = num_epochs * steps_per_epoch

        self.schedule = make_lr_schedule(lr, warmup_steps, total_steps)
        # bf16 first moment is the shipped default (docs/KERNELS.md train
        # ablation: frees ~0.9 GB at Base scale, no measured loss impact;
        # set adam_mu_dtype: float32 to opt out)
        self.tx = make_optimizer(
            self.schedule,
            betas=betas,
            max_grad_norm=config.get("max_grad_norm", 1.0),
            mu_dtype=(jnp.bfloat16
                      if config.get("adam_mu_dtype", "bfloat16") == "bfloat16"
                      else None),
        )
        self.ema_decay = config.get("ema_decay", 0.9999)
        # ZeRO-1 (config "shard_opt_states"): AdamW moments shard over the
        # data mesh axis instead of replicating — see _apply_mesh
        self.shard_opt_states = bool(config.get("shard_opt_states", False))
        self._opt_gather_jit = None  # cached by _fetchable_opt_state
        self._preempt_requested = False
        self._preempt_installed = False

        if model.variables is None:
            model.init_params(0)
        params = model.variables["params"]
        self.state = TrainState(
            params=params,
            opt_state=self.tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.array, params),
            step=jnp.asarray(0, jnp.int32),
            ema_updates=jnp.asarray(0, jnp.int32),
        )
        self.state = self._apply_mesh(self.state)
        # pin step outputs to the canonical placement on mesh runs (metrics
        # replicated) so ZeRO-1 propagation can't leave params data-sharded
        step_out = None
        if mesh is not None:
            from oron_tts_tpu.parallel.mesh import replicated

            rep = replicated(mesh)
            step_out = (
                self._state_shardings(self.state),
                {"loss": rep, "grad_norm": rep, "ok": rep},
            )

        self._train_step = make_train_step(
            model.cfm, self.tx, self.ema_decay, out_shardings=step_out
        )
        self._eval_step = make_eval_step(model.cfm)
        self._accum_step = make_accum_step(model.cfm)
        self._apply_accum = make_apply_accum_step(
            self.tx, self.ema_decay, out_shardings=step_out
        )
        self._zero_accum = make_zero_accum()
        # AOT AUTO-layout steps (one compile per batch shape, no donation
        # recompile); mesh runs keep plain jit — GSPMD shardings already
        # pin layouts there
        self.use_aot = bool(config.get("aot_train_step", True)) and mesh is None
        self._aot_steps: dict[Any, Any] = {}
        self._state_format: Any | None = None

        self.global_step = 0
        self.epoch = 0
        self._best_val = float("inf")
        self.use_tqdm = config.get("use_tqdm", True)

        self.checkpoint_manager = CheckpointManager(
            checkpoint_dir,
            model_name="f5tts",
            max_checkpoints=config.get("max_checkpoints", 5),
            # async disk writes: the loop pays only the device→host fetch;
            # the multi-GB npz write + rotation happen on a writer thread
            async_writes=bool(config.get("async_checkpoint", False)),
        )
        self.logger = self._setup_logger()
        self.writer = self._setup_tensorboard()

    def _state_shardings(self, state: TrainState) -> TrainState:
        """Canonical sharding tree for a TrainState on this mesh."""
        from oron_tts_tpu.parallel.mesh import (
            opt_shardings,
            param_shardings,
            replicated,
        )

        if self.shard_opt_states:
            # ZeRO-1: AdamW moments shard over the data axis (mesh.py
            # opt_specs) — frees ~2 × params of HBM per chip for bigger
            # frame budgets / no-remat at the cost of a reduce-scatter +
            # all-gather pair per step
            opt_sh = opt_shardings(self.mesh, state.opt_state, state.params)
        else:
            opt_sh = jax.tree_util.tree_map(
                lambda _: replicated(self.mesh), state.opt_state,
            )
        return TrainState(
            params=param_shardings(self.mesh, state.params),
            opt_state=opt_sh,
            ema_params=param_shardings(self.mesh, state.params),
            step=replicated(self.mesh),
            ema_updates=replicated(self.mesh),
        )

    def _apply_mesh(self, state: TrainState) -> TrainState:
        """Place a TrainState per the mesh sharding rules (no-op without mesh).

        Used both at construction and after checkpoint resume so resumed runs
        keep the exact same TP/DP placement as fresh starts.
        """
        if self.mesh is None:
            return state
        return jax.device_put(state, self._state_shardings(state))

    # ── infra ────────────────────────────────────────────────────────────

    def _setup_logger(self) -> logging.Logger:
        logger = logging.getLogger("F5Trainer")
        # non-zero ranks keep warnings/errors but stay quiet otherwise
        logger.setLevel(logging.INFO if self.is_main_process else logging.WARNING)
        logger.handlers.clear()
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter("[%(asctime)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S")
        )
        logger.addHandler(handler)
        return logger

    def _setup_tensorboard(self):
        if not self.is_main_process:
            return None
        try:
            from tensorboardX import SummaryWriter

            path = Path(self.log_dir).expanduser().resolve()
            path.mkdir(parents=True, exist_ok=True)
            self.log_dir = str(path)
            self.logger.info("TensorBoard log_dir = %s", self.log_dir)
            return SummaryWriter(log_dir=self.log_dir, flush_secs=30)
        except ImportError:
            self.logger.warning("tensorboardX not installed — console logging only")
            return None

    def _device_mem_gb(self) -> float | None:
        """Peak device memory in GB (falls back to current bytes_in_use).

        Mirrors the reference's ``torch.cuda.max_memory_allocated``
        (trainer.py:298-300) rather than instantaneous usage.
        """
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats:
                for key in ("peak_bytes_in_use", "bytes_in_use"):
                    if key in stats:
                        return stats[key] / 1e9
        except Exception:
            pass
        return None

    # ── steps ────────────────────────────────────────────────────────────

    def _get_train_step(self, batch: dict[str, Any], rng: jax.Array):
        """Fused-step callable for this batch shape.

        With ``aot_train_step`` (default, single-chip) each new batch
        shape AOT-compiles ONCE with AUTO layouts — the donated state's
        input/output layouts match, so the classic second compile on the
        aliased feedback call never happens. Falls back to the plain jit
        step on any failure.
        """
        if not self.use_aot:
            return self._train_step
        key = tuple(
            (k, tuple(v.shape), str(getattr(v, "dtype", "")))
            for k, v in sorted(batch.items())
        )
        step = self._aot_steps.get(key)
        if step is None:
            try:
                step, self.state, self._state_format = compile_train_step_auto(
                    self.model.cfm, self.tx, self.ema_decay,
                    self.state, batch, rng, state_format=self._state_format,
                )
            except Exception as exc:
                if os.environ.get("ORON_AOT_STRICT"):
                    raise
                self.logger.warning(
                    "AOT train-step compile failed (%s); using plain jit", exc
                )
                self.use_aot = False
                if self._state_format is not None:
                    # a previous AOT compile re-laid the state into XLA-
                    # chosen layouts; feeding that into the default-layout
                    # plain-jit executable dies device-side
                    # (INVALID_ARGUMENT, measured on v5e). Round-trip
                    # through the host to restore default layouts — slow,
                    # but this path runs at most once per process.
                    self.state = jax.device_put(jax.device_get(self.state))
                    self._state_format = None
                return self._train_step
            self._aot_steps[key] = step
        return step

    def _shard(self, batch: dict[str, np.ndarray]) -> dict[str, Any]:
        if self.mesh is None:
            return batch
        from oron_tts_tpu.parallel.mesh import shard_batch

        return shard_batch(self.mesh, batch)

    def _drain_pending(
        self,
        pending: list[tuple[dict[str, Any], int, int]],
        pbar: Any | None,
    ) -> tuple[float, int]:
        """Fetch a window of in-flight step metrics with ONE host sync.

        TPU-first pipelining (VERDICT r1 #5): the fused train step is
        dispatched without reading its outputs, keeping the device queue
        full; metrics come back in batches here. Guards already acted
        on-device (`_guarded_update` freezes state on a bad step), so the
        host side only does bookkeeping: loss accounting, step counting,
        TensorBoard scalars and skip warnings.
        """
        host = jax.device_get([m for m, _, _ in pending])
        window_loss, window_updates = 0.0, 0
        last_ok: tuple[float, float, float] | None = None
        for m, (_, batch_size, mel_frames) in zip(host, pending):
            loss = float(m["loss"])
            grad_norm = float(m["grad_norm"])
            ok = bool(m["ok"])
            if not math.isfinite(loss):
                self.logger.warning(
                    "Skipping batch due to non-finite loss=%s", loss
                )
                continue
            if not ok:
                self.logger.warning(
                    "Skipped optimizer step (non-finite grad_norm=%s)", grad_norm
                )
                continue
            window_loss += loss
            window_updates += 1
            self.global_step += 1
            lr = float(self.schedule(self.global_step))
            last_ok = (loss, lr, grad_norm)
            if self.writer:
                self.writer.add_scalar("train/loss", loss, self.global_step)
                self.writer.add_scalar("train/lr", lr, self.global_step)
                self.writer.add_scalar("train/grad_norm", grad_norm, self.global_step)
                self.writer.add_scalar("train/batch_size", batch_size, self.global_step)
                self.writer.add_scalar("train/mel_frames", mel_frames, self.global_step)
            log_interval = self.config.get("log_interval", 100)
            if self.global_step % log_interval == 0 and not self.use_tqdm:
                self.logger.info(
                    f"Step {self.global_step} | loss={loss:.4f} | "
                    f"lr={lr:.2e} | grad_norm={grad_norm:.4f} | B={batch_size}"
                )
        if self.writer:
            mem = self._device_mem_gb()
            if mem is not None:
                self.writer.add_scalar("system/vram_gb", mem, self.global_step)
        if pbar is not None and last_ok is not None:
            loss, lr, grad_norm = last_ok
            pbar.set_postfix(
                loss=f"{loss:.4f}", lr=f"{lr:.1e}", gn=f"{grad_norm:.2f}"
            )
        return window_loss, window_updates

    def train_epoch(self, total_epochs: int) -> float:
        total_loss, n_updates = 0.0, 0
        epoch_start = time.monotonic()
        rng = jax.random.PRNGKey(self.config.get("seed", 0) + self.epoch)

        iterator = self.train_loader
        pbar = None
        if self.use_tqdm:
            from tqdm import tqdm

            pbar = tqdm(
                self.train_loader,
                desc=f"Epoch {self.epoch + 1}/{total_epochs}",
            )
            iterator = pbar

        accum_grads = None  # on-device window accumulator (grad_accum > 1)
        # in-flight metrics window: bounds both host syncs (one per window)
        # and the number of batches held alive by queued dispatches
        pending: list[tuple[dict[str, Any], int, int]] = []
        drain_every = max(1, self.config.get(
            "metrics_drain_interval",
            min(self.config.get("log_interval", 100), 16),
        ))

        profile_at = self.config.get("profile_step")  # global step to trace
        profiling = False
        # global_step only advances when a metrics window drains (up to
        # drain_every steps at once), so gate the trace on a per-dispatch
        # counter — otherwise the trace starts a window late and spans
        # ~drain_every steps instead of 3
        dispatched_step = self.global_step
        multihost = jax.process_count() > 1
        for accum_step, batch in enumerate(iterator):
            # host-side mel guard only in single-process runs: on a pod the
            # decision would be host-LOCAL (each host sees its own slice) and
            # a one-sided skip deadlocks the step's collectives. The on-device
            # guard covers it globally there (NaN mel -> non-finite loss ->
            # _guarded_update freezes state on every host identically).
            if not multihost and not np.isfinite(batch["mel"]).all():
                self.logger.warning("Skipping batch due to non-finite mel values")
                continue
            # >= not ==: grad-accum microbatches don't advance the counter,
            # so exact values can be skipped over
            if profile_at is not None and not profiling and dispatched_step >= profile_at:
                jax.profiler.start_trace(str(Path(self.log_dir) / "profile"))
                profiling = True
            elif profiling and dispatched_step >= profile_at + 3:
                jax.profiler.stop_trace()
                self.logger.info("Profiler trace written to %s/profile", self.log_dir)
                profile_at, profiling = None, False
            rng, step_rng = jax.random.split(rng)
            sharded = self._shard(batch)
            batch_size = int(batch["mel"].shape[0])
            mel_frames = int(batch["mel"].shape[2])

            if self.grad_accum == 1:
                # dispatch without reading outputs — the read happens in
                # windows via _drain_pending so the device pipeline stays full
                step = self._get_train_step(sharded, step_rng)
                self.state, metrics = step(self.state, sharded, step_rng)
                pending.append((metrics, batch_size, mel_frames))
                dispatched_step += 1
            else:
                # fully on-device accumulation (no per-microbatch host sync,
                # VERDICT r2 #6): grads/losses/finite-flags live in a donated
                # accumulator; only the window's apply step produces metrics,
                # which drain in the same deferred windows as the fused step
                if accum_grads is None:
                    accum_grads = self._zero_accum(self.state.params)
                accum_grads = self._accum_step(
                    accum_grads, self.state.params, sharded, step_rng
                )
                if (accum_step + 1) % self.grad_accum != 0:
                    continue
                self.state, metrics = self._apply_accum(self.state, accum_grads)
                accum_grads = None
                pending.append((metrics, batch_size, mel_frames))
                dispatched_step += 1

            if len(pending) >= drain_every:
                w_loss, w_updates = self._drain_pending(pending, pbar)
                total_loss += w_loss
                n_updates += w_updates
                pending = []
                self._maybe_preempt()  # drain = host-sync point

        # flush a partial accumulation window (reference trainer.py:319-327);
        # the on-device finite count makes the mean scale come out right
        if accum_grads is not None:
            self.state, metrics = self._apply_accum(self.state, accum_grads)
            accum_grads = None
            pending.append((metrics, 0, 0))

        if pending:
            w_loss, w_updates = self._drain_pending(pending, pbar)
            total_loss += w_loss
            n_updates += w_updates
            pending = []
        if profiling:
            jax.profiler.stop_trace()
            self.logger.info("Profiler trace written to %s/profile", self.log_dir)
        self._maybe_preempt()  # end-of-epoch flush is a sync point too

        self.epoch += 1
        epoch_time = time.monotonic() - epoch_start
        samples = getattr(self.train_loader.dataset, "__len__", lambda: 0)()
        throughput = samples / epoch_time if epoch_time > 0 else 0.0
        cache_str = ""
        # resident item-cache footprint, once per epoch (subsets forward to
        # their .base dataset)
        ds = self.train_loader.dataset
        ds = getattr(ds, "base", ds)
        stats_fn = getattr(ds, "cache_stats", None)
        if callable(stats_fn):
            st = stats_fn()
            cache_str = (f" | cache={st['bytes'] / 1e6:.0f}MB"
                         f"/{st['budget_bytes'] / 1e6:.0f}MB")
        self.logger.info(
            f"  ↳ epoch {self.epoch}: {epoch_time:.1f}s | "
            f"{throughput:.0f} samples/s | "
            f"avg_loss={total_loss / max(n_updates, 1):.4f}{cache_str}"
        )
        return total_loss / max(n_updates, 1)

    def validate(self, use_ema: bool = True) -> float:
        params = self.state.ema_params if use_ema else self.state.params
        total, n = 0.0, 0
        if self.val_loader is not None:
            # dispatch val batches without reading results, fetching losses
            # in bounded windows — the same pipelining discipline as the
            # train loop's _drain_pending. Windowing (not one epoch-wide
            # sync) bounds how many in-flight batch input buffers HBM holds
            # at once: at the near-ceiling regime the epoch-boundary OOM
            # fixes document, an unbounded dispatch of a large val set can
            # itself OOM (round-4 advisor finding).
            drain_every = max(1, self.config.get(
                "metrics_drain_interval",
                min(self.config.get("log_interval", 100), 16),
            ))
            pending: list[Any] = []
            for batch in self.val_loader:
                pending.append(self._eval_step(params, self._shard(batch)))
                if len(pending) >= drain_every:
                    for loss in jax.device_get(pending):
                        total += float(loss)
                        n += 1
                    pending = []
            for loss in jax.device_get(pending):
                total += float(loss)
                n += 1
        if jax.process_count() > 1:
            # cross-host agreement so ``is_best`` (and thus f5tts_best.npz)
            # is identical everywhere. Under a GlobalBatchSchedule every
            # host already holds the same global-batch losses and this is a
            # no-op numerically; under host-local val shards it averages
            # them. Every host must reach this line each epoch (collective).
            from jax.experimental import multihost_utils

            sums = multihost_utils.process_allgather(
                np.asarray([total, float(n)], np.float32)
            )
            total = float(np.sum(sums[:, 0]))
            n = int(np.sum(sums[:, 1]))
        return total / max(n, 1)

    def _log_audio_samples(self, epoch: int) -> None:
        if not self.writer:
            return
        interval = self.config.get("audio_sample_interval", 10)
        if epoch % interval != 0:
            return
        samples = self.config.get(
            "audio_samples",
            [["Сайн байна уу, та хэрхэн байна?", "mn"],
             ["Монгол улс сайхан орон.", "mn"]],
        )
        saved = self.model.variables
        self.model.variables = {"params": self.state.ema_params}
        try:
            for entry in samples[:2]:
                text, lang = entry[0], entry[1]
                tag = f"{lang}/{text[:20].replace(' ', '_')}"
                try:
                    wav = self.model.synthesize(text, lang=lang, n_steps=16)
                    self.writer.add_audio(
                        f"audio/{tag}", wav[None, :], epoch,
                        sample_rate=self.model.sample_rate,
                    )
                    from oron_tts_tpu.ops.mel import log_mel_numpy

                    mel = log_mel_numpy(wav, self.model.audio_processor.mel_config)
                    img = mel[::-1][None]
                    img = (img - img.min()) / (img.max() - img.min() + 1e-8)
                    self.writer.add_image(f"mel/{tag}", img, epoch)
                except Exception as exc:
                    self.logger.warning(
                        "Audio sample synthesis failed for %r: %s", text, exc,
                        exc_info=True,
                    )
        finally:
            self.model.variables = saved

    def install_signal_handlers(self) -> None:
        """SIGTERM → emergency checkpoint at the next metrics window.

        TPU-VM preemptions / job evictions deliver SIGTERM with a short
        grace period (the reference has no analogue — recovery there is
        manual ``--resume``, README.md:106). The handler only sets a
        flag; the train loop acts at the next metrics-drain window,
        which is already a host-sync point. Multi-host runs all-reduce
        the flag there first, so a signal that lands on a subset of
        hosts still produces one agreed decision and the (collective)
        ZeRO-1 checkpoint gather cannot deadlock. After the checkpoint
        is on disk, ``TrainingPreempted`` propagates out of ``train()``
        for the CLI to do its best-effort hub push.

        Opt-in (called by the train CLI, not the constructor): library
        users and tests keep their process-global signal table.
        """
        import signal

        def _on_term(signum, frame):  # noqa: ARG001 — signal signature
            self._preempt_requested = True

        signal.signal(signal.SIGTERM, _on_term)
        self._preempt_installed = True

    def _preempt_agreed(self) -> bool:
        """The (possibly one-sided) SIGTERM flag, agreed across hosts."""
        flag = self._preempt_requested
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            flag = bool(
                multihost_utils.process_allgather(
                    np.asarray(flag, dtype=np.bool_)
                ).any()
            )
        return flag

    def _maybe_preempt(self) -> None:
        if not self._preempt_installed or not self._preempt_agreed():
            return
        self.logger.warning(
            "SIGTERM received — emergency checkpoint at step %d",
            self.global_step,
        )
        self.save_checkpoint(loss=None)
        self.checkpoint_manager.wait()
        raise TrainingPreempted(
            f"preempted; checkpoint written at step {self.global_step}"
        )

    def train(self, num_epochs: int, save_interval: int = 5) -> None:
        self.logger.info(
            f"Training: epochs {self.epoch}→{num_epochs}, "
            f"grad_accum={self.grad_accum}, devices={jax.device_count()}"
        )
        start_epoch = self.epoch
        train_start = time.monotonic()

        for _ in range(self.epoch, num_epochs):
            sampler = getattr(self.train_loader, "batch_sampler", None)
            if sampler is not None and hasattr(sampler, "set_epoch"):
                sampler.set_epoch(self.epoch)

            avg_loss = self.train_epoch(total_epochs=num_epochs)

            val_loss = self.validate(use_ema=True)
            self._log_audio_samples(self.epoch)
            is_best = 0 < val_loss < self._best_val
            if is_best:
                self._best_val = val_loss

            elapsed = time.monotonic() - train_start
            done = self.epoch - start_epoch
            remaining = elapsed / done * (num_epochs - self.epoch) if done else 0.0
            eta_h, eta_s = divmod(int(remaining), 3600)
            lr = float(self.schedule(self.global_step))
            val_str = f" | val_loss={val_loss:.4f}" if val_loss > 0 else ""
            self.logger.info(
                f"Epoch {self.epoch}/{num_epochs} | avg_loss={avg_loss:.4f}"
                f"{val_str} | lr={lr:.2e} | ETA={eta_h}h{eta_s // 60:02d}m"
            )
            if self.writer:
                self.writer.add_scalar("epoch/train_loss", avg_loss, self.epoch)
                if val_loss > 0:
                    self.writer.add_scalar("epoch/val_loss", val_loss, self.epoch)
                self.writer.add_scalar("epoch/lr", lr, self.epoch)
                self.writer.flush()

            if self.epoch % save_interval == 0:
                self.save_checkpoint(is_best=is_best, loss=avg_loss)
                self._maybe_push_to_hub()
            elif is_best and self.config.get("save_best_between_intervals",
                                             True):
                # a best epoch between intervals must still reach disk —
                # write f5tts_best.npz only (no step file, no rotation).
                # is_best is all-reduced, so EVERY host enters this branch
                # and joins the (collective) ZeRO-1 gather; only rank 0
                # writes.
                opt_state = self._fetchable_opt_state()
                if self.is_main_process:
                    self.checkpoint_manager.save_best(
                        step=self.global_step,
                        params=self._relayout(self.state.params,
                                              scan_blocks=False),
                        opt_state=self._relayout(opt_state,
                                                 scan_blocks=False),
                        ema_params=self._relayout(self.state.ema_params,
                                                  scan_blocks=False),
                        loss=avg_loss,
                        config=self.config,
                        extra_state={"epoch": self.epoch,
                                     "best_val": self._best_val},
                    )

        self.finish()

    def finish(self) -> None:
        # surface any async checkpoint-writer failure before declaring done
        self.checkpoint_manager.wait()
        if self.writer:
            self.writer.flush()
            self.writer.close()
            self.writer = None
        # keep the facade pointing at the trained weights
        self.model.variables = {"params": self.state.params}

    # ── checkpointing ────────────────────────────────────────────────────

    def _relayout(self, tree: Any, scan_blocks: bool) -> Any:
        """Re-layout every DiT block subtree in ``tree`` (params, EMA, or
        optimizer moments) between the stacked ``blocks`` scan layout and
        the unrolled ``block{i}`` disk layout.

        The on-disk contract is the unrolled layout (torch interop /
        USAGE.md); a model with ``scan_blocks=True`` holds stacked params —
        and Adam mu/nu mirror whichever layout the model uses — so both
        save and resume must convert or flipping ``model.scan_blocks``
        between runs breaks at apply time.

        SAVE direction (scan_blocks=False) fetches device leaves to HOST
        first: unstacking slices every stacked tensor per block, and on
        device those slices materialize a full extra copy of the tree
        (~6 GB at Base for params+moments+EMA) while the training
        pipeline may be at its HBM peak — measured as an epoch-boundary
        OOM on v5e when a best-val save landed between remat epochs near
        the ceiling. On host the same slices are numpy views (free), and
        the device→host fetch was owed to the checkpoint writer anyway.
        """
        from collections.abc import Mapping

        from oron_tts_tpu.models.dit import adapt_block_layout

        if not scan_blocks:
            tree = jax.device_get(tree)
        depth = self.model.backbone.depth

        def rec(node: Any) -> Any:
            if isinstance(node, Mapping):
                if "blocks" in node or "block0" in node:
                    return adapt_block_layout(dict(node), depth, scan_blocks)
                return {k: rec(v) for k, v in node.items()}
            if isinstance(node, tuple) and hasattr(node, "_fields"):
                return type(node)(*(rec(v) for v in node))
            if isinstance(node, (list, tuple)):
                return type(node)(rec(v) for v in node)
            return node

        return rec(tree)

    def _fetchable_opt_state(self) -> Any:
        """Optimizer state every host can materialize on the host.

        Under ZeRO-1 on a pod the AdamW moments are sharded across the
        cross-process ``data`` axis — ``jax.device_get`` on such arrays
        raises (non-addressable shards), so they are all-gathered to
        replicated first. COLLECTIVE in that case: every host must call
        this at the same point, BEFORE any rank-0-gated save. Single
        process (or replicated optimizer) returns the state as is.

        Gathers LEAF AT A TIME and fetches each replicated copy to host
        before the next: the transient HBM spike is one leaf, not the
        full 2 × params of moments (which would claw back exactly the
        headroom ZeRO-1 exists to free). The jitted identity-with-
        out-shardings is cached on the trainer so repeated saves reuse
        compiled gathers instead of re-tracing a fresh lambda.
        """
        opt = self.state.opt_state
        if (self.shard_opt_states and self.mesh is not None
                and jax.process_count() > 1):
            if self._opt_gather_jit is None:
                from oron_tts_tpu.parallel.mesh import replicated

                self._opt_gather_jit = jax.jit(
                    lambda x: x, out_shardings=replicated(self.mesh),
                )
            gather = self._opt_gather_jit
            # tree_map visits leaves in deterministic pytree order, so
            # every host issues the collectives in the same sequence
            opt = jax.tree_util.tree_map(
                lambda x: jax.device_get(gather(x)), opt,
            )
        return opt

    def save_checkpoint(self, is_best: bool = False,
                        loss: float | None = None) -> Path | None:
        # collective under ZeRO-1 on a pod — must run on EVERY host,
        # hence before the rank gate
        opt_state = self._fetchable_opt_state()
        if not self.is_main_process:
            return None  # rank-0 only (reference trainer.py:124-135)
        return self.checkpoint_manager.save(
            step=self.global_step,
            params=self._relayout(self.state.params, scan_blocks=False),
            opt_state=self._relayout(opt_state, scan_blocks=False),
            ema_params=self._relayout(self.state.ema_params, scan_blocks=False),
            loss=loss,
            config=self.config,
            is_best=is_best,
            extra_state={"epoch": self.epoch, "best_val": self._best_val},
        )

    def load_checkpoint(self, path: str | Path | None = None,
                        load_best: bool = False) -> None:
        info = self.checkpoint_manager.load(path=path, load_best=load_best)
        if jax.process_count() > 1:
            info = self._sync_checkpoint_from_main(info)
        if info.get("params") is None:
            self.logger.info("No checkpoint found — starting fresh")
            return
        self.global_step = int(info.get("step", 0))
        self.epoch = int(info.get("epoch", 0))
        best = info.get("best_val")
        self._best_val = float(best) if best is not None else float("inf")
        scan = self.model.backbone.scan_blocks
        params = self._relayout(info["params"], scan_blocks=scan)
        opt_state = info.get("opt")
        if opt_state is not None:
            opt_state = self._relayout(opt_state, scan_blocks=scan)
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.tx.init(params)),
                jax.tree_util.tree_leaves(opt_state),
            )
        else:
            opt_state = self.tx.init(params)
        ema = info.get("ema") if info.get("ema") is not None else params
        ema = self._relayout(ema, scan_blocks=scan)
        self.state = self._apply_mesh(TrainState(
            params=params,
            opt_state=opt_state,
            ema_params=ema,
            step=jnp.asarray(self.global_step, jnp.int32),
            ema_updates=jnp.asarray(self.global_step, jnp.int32),
        ))
        self.model.variables = {"params": self.state.params}
        # resumed state carries fresh (default) layouts — stale AOT
        # executables expect the AUTO layouts of the pre-resume state
        self._aot_steps.clear()
        self._state_format = None
        self.logger.info(
            "Resumed from step %d (epoch %d)", self.global_step, self.epoch
        )

    def _sync_checkpoint_from_main(self, info: dict) -> dict:
        """Make every host resume from rank 0's checkpoint view.

        Only rank 0 saves (non-shared filesystems are the norm on pods), so
        other hosts may find nothing — or, worse, a stale local rotation.
        Rank 0's (step, epoch, best_val) and weight trees are broadcast;
        hosts that found nothing contribute their fresh state as the
        broadcast template (same model/optimizer ⇒ same tree structure).
        Every host MUST call this (it is a collective).
        """
        from jax.experimental import multihost_utils

        found = info.get("params") is not None
        meta = multihost_utils.broadcast_one_to_all(
            np.asarray([
                1.0 if found else 0.0,
                float(info.get("step", 0) or 0),
                float(info.get("epoch", 0) or 0),
                # explicit None check: a best_val of exactly 0.0 is a real
                # best, not "no best yet"
                np.inf if info.get("best_val") is None
                else float(info["best_val"]),
            ], np.float64)
        )
        if meta[0] < 0.5:  # rank 0 has no checkpoint: all start fresh
            return {"params": None}
        # template for hosts without a file: current (fresh) state in the
        # on-disk layout so tree structures match rank 0's loaded trees
        template = {
            "params": self._relayout(
                jax.device_get(self.state.params), scan_blocks=False),
            "ema": self._relayout(
                jax.device_get(self.state.ema_params), scan_blocks=False),
            # collective under ZeRO-1: every host reaches this line
            # (broadcast agreement above), so the gather is safe
            "opt": self._relayout(
                jax.device_get(self._fetchable_opt_state()),
                scan_blocks=False),
        }
        local = {
            k: info.get(k) if found and info.get(k) is not None else template[k]
            for k in ("params", "ema", "opt")
        }
        # Broadcast the CANONICAL flat path→array form (the on-disk
        # contract, checkpoint.flatten_tree) rather than the raw pytrees:
        # rank 0 holds nested dicts/lists from unflatten_tree while
        # checkpoint-less hosts hold optax namedtuples, and
        # broadcast_one_to_all matches leaves purely by position. The
        # positional orders do agree today (tuple levels flatten in field
        # order on both sides), but the flat form makes the match by PATH
        # and turns any future structure drift into a loud treedef error
        # instead of silently swapping same-shaped moment tensors. It also
        # gives every host the same nested-dict view a checkpoint-ful
        # host gets from CheckpointManager.load.
        from oron_tts_tpu.train.checkpoint import (
            flatten_tree,
            unflatten_tree,
        )

        local_flat = {
            k: dict(sorted(flatten_tree(v).items())) for k, v in local.items()
        }
        synced_flat = multihost_utils.broadcast_one_to_all(local_flat)
        synced = {k: unflatten_tree(v) for k, v in synced_flat.items()}
        step_val = int(meta[1])
        best = float(meta[3])
        out = dict(info)
        out.update(synced)
        out["step"] = step_val
        out["epoch"] = int(meta[2])
        out["best_val"] = None if not np.isfinite(best) else best
        return out

    def _maybe_push_to_hub(self) -> None:
        if self.hub_repo_id is None or not self.is_main_process:
            return
        self._upload_count += 1
        if self._upload_count < self.hub_upload_interval:
            return
        self._upload_count = 0
        try:
            url = self.push_to_hub(
                self.hub_repo_id, token=self.hub_token, private=self.hub_private
            )
            self.logger.info("Uploaded checkpoints and logs to %s", url)
        except Exception as exc:
            self.logger.warning("HuggingFace upload failed: %s", exc, exc_info=True)

    def push_to_hub(self, repo_id: str, token: str | None = None,
                    private: bool = False) -> str:
        if not self.is_main_process:
            return f"https://huggingface.co/{repo_id} (skipped: not rank 0)"
        if self.writer:
            self.writer.flush()
        return self.checkpoint_manager.push_to_hub(
            repo_id, token=token, private=private, log_dir=self.log_dir
        )
