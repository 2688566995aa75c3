"""Optimal-Transport Conditional Flow Matching: loss + Euler ODE sampler.

Semantics parity with reference /root/reference/src/models/flow.py:
- training: per-sample random contiguous span mask with fraction
  ~ U(frac_lengths_mask), per-sample t ~ U(0,1), batch-level CFG dropout
  (one Bernoulli per batch; drop_text forces drop_audio), masked-span MSE
- eval: deterministic (t=0.5, centered mid-fraction span, fixed noise key,
  no dropout) so val_loss is epoch-comparable
- sampling: CFG double-batch velocity, sway-warped timesteps, explicit
  Euler via lax.scan, conditioning region re-substituted at the end

TPU-first design: everything is shape-static and jittable; noise is
injectable for cross-framework parity tests; the text embedding is computed
once per CFG branch and closed over by the scan body (the reference's cache,
but functional).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as _np

from oron_tts_tpu.models.dit import DiT


def lens_to_mask(lens: jnp.ndarray, length: int) -> jnp.ndarray:
    return jnp.arange(length)[None, :] < lens[:, None]


def span_mask_from_fracs(
    lens: jnp.ndarray,
    frac_lengths: jnp.ndarray,
    starts_u: jnp.ndarray,
    length: int,
) -> jnp.ndarray:
    """Contiguous random span per row: start ~ U * (len - span), width frac*len."""
    span = (frac_lengths * lens).astype(jnp.int32)
    max_start = lens - span
    start = jnp.clip((max_start * starts_u).astype(jnp.int32), 0, None)
    end = start + span
    pos = jnp.arange(length)[None, :]
    return (pos >= start[:, None]) & (pos < end[:, None])


def per_sample_noise(
    key: jax.Array, batch: int, length: int, n_mels: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Initial ODE noise where element [i, t, :] depends only on
    (key, row index i, frame index t).

    This is batch-composition AND bucket-padding invariant: row i of a
    batched synthesis equals the single-sample draw with the same seed,
    regardless of what else shares the batch or how far the bucket pads.
    Mirrors the intent of the reference's per-sample draws
    (/root/reference/src/models/flow.py:269-283) with a stronger guarantee
    (the reference's shared Generator still leaks batch order).
    """

    def row(i: jnp.ndarray) -> jnp.ndarray:
        row_key = jax.random.fold_in(key, i)

        def frame(t: jnp.ndarray) -> jnp.ndarray:
            return jax.random.normal(
                jax.random.fold_in(row_key, t), (n_mels,), dtype
            )

        return jax.vmap(frame)(jnp.arange(length))

    return jax.vmap(row)(jnp.arange(batch))


def per_row_noise(
    keys: jnp.ndarray, length: int, n_mels: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Initial ODE noise from one PRNG key PER ROW ([B, 2] uint32).

    Row i equals ``per_sample_noise(keys[i], batch=1, ...)[0]`` — the
    single-sample draw for that key — so a batched solve reproduces each
    request's solo output bit-for-bit regardless of batch composition
    (the serving batcher's determinism contract; see
    F5TTS.synthesize_batch ``seeds``).
    """

    def row(k: jnp.ndarray) -> jnp.ndarray:
        row_key = jax.random.fold_in(k, 0)

        def frame(t: jnp.ndarray) -> jnp.ndarray:
            return jax.random.normal(
                jax.random.fold_in(row_key, t), (n_mels,), dtype
            )

        return jax.vmap(frame)(jnp.arange(length))

    return jax.vmap(row)(keys)


def sway_timesteps_host(steps: int, coef: float | None) -> _np.ndarray:
    """Float64 host copy of the integration grid.

    The ONE place the sway warp formula lives: the device grid the
    sampler integrates on and the static CFG-interval membership are
    both derived from this, so they can never desynchronize.
    """
    t = _np.linspace(0.0, 1.0, steps + 1)
    if coef is not None:
        t = t + coef * (_np.cos(_np.pi / 2 * t) - 1 + t)
    return t


def sway_timesteps(steps: int, coef: float | None, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform [0,1] grid of steps+1 points, optionally sway-warped."""
    return jnp.asarray(sway_timesteps_host(steps, coef), dtype=dtype)


@dataclass(frozen=True)
class CFMConfig:
    audio_drop_prob: float = 0.3
    cond_drop_prob: float = 0.2
    frac_lengths_mask: tuple[float, float] = (0.7, 1.0)
    n_mels: int = 100


class CFM:
    """Stateless trainer/sampler around a DiT backbone."""

    def __init__(self, backbone: DiT, config: CFMConfig | None = None) -> None:
        self.backbone = backbone
        self.config = config or CFMConfig()

    # ── training ──────────────────────────────────────────────────────────

    def loss(
        self,
        variables: Any,
        mel: jnp.ndarray,
        text_ids: jnp.ndarray,
        lens: jnp.ndarray | None,
        rng: jax.Array,
        train: bool = True,
        x0: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Scalar CFM loss. mel: [B, n_mels, T] or [B, T, n_mels]."""
        cfg = self.config
        if mel.ndim == 3 and mel.shape[1] == cfg.n_mels:
            mel = mel.swapaxes(1, 2)
        x1 = mel
        batch, seq_len = x1.shape[0], x1.shape[1]

        if lens is None:
            lens = jnp.full((batch,), seq_len, dtype=jnp.int32)
        lens = lens.astype(jnp.int32)
        mask = lens_to_mask(lens, seq_len)

        k_frac, k_start, k_t, k_noise, k_drop_a, k_drop_t, k_dropout = (
            jax.random.split(rng, 7)
        )

        lo, hi = cfg.frac_lengths_mask
        if train:
            frac = jax.random.uniform(k_frac, (batch,), minval=lo, maxval=hi)
            starts_u = jax.random.uniform(k_start, (batch,))
            span = span_mask_from_fracs(lens, frac, starts_u, seq_len) & mask
            t = jax.random.uniform(k_t, (batch,), dtype=x1.dtype)
            drop_audio = jax.random.uniform(k_drop_a, ()) < cfg.audio_drop_prob
            drop_text = jax.random.uniform(k_drop_t, ()) < cfg.cond_drop_prob
            drop_audio = drop_audio | drop_text
            if x0 is None:
                x0 = jax.random.normal(k_noise, x1.shape, dtype=x1.dtype)
        else:
            mid = (lo + hi) / 2
            span_len = (mid * lens).astype(jnp.int32)
            start = jnp.clip((lens - span_len) // 2, 0, None)
            pos = jnp.arange(seq_len)[None, :]
            span = (pos >= start[:, None]) & (pos < (start + span_len)[:, None]) & mask
            t = jnp.full((batch,), 0.5, dtype=x1.dtype)
            drop_audio = jnp.asarray(False)
            drop_text = jnp.asarray(False)
            if x0 is None:
                x0 = jax.random.normal(
                    jax.random.PRNGKey(0), x1.shape, dtype=x1.dtype
                )

        cond = jnp.where(span[..., None], 0.0, x1)
        tb = t[:, None, None]
        phi = (1 - tb) * x0 + tb * x1
        flow = x1 - x0

        pred = self.backbone.apply(
            variables,
            phi,
            cond,
            text_ids,
            t,
            mask=mask,
            drop_audio_cond=drop_audio,
            drop_text=drop_text,
            deterministic=not train,
            # dropout stays on threefry DELIBERATELY: it costs ~32 ms of
            # Base forward wall time (roofline r4, fwd 244 vs 212 ms with
            # dropout off), but re-keying onto the hardware rbg generator
            # was measured to OOM the no-remat step at compile (17.3 vs
            # 15.75 GB HBM): XLA rematerializes threefry bits in the
            # backward instead of saving the 22-layer mask residuals,
            # while rbg bits are treated as non-rematerializable.
            rngs={"dropout": k_dropout} if train else {},
        )

        se = jnp.square(pred - flow)
        weight = span[..., None].astype(se.dtype)
        # mean over masked *elements* (span frames × mel bins), flow.py:155-158
        denom = jnp.sum(weight) * se.shape[-1]
        return jnp.sum(se * weight) / jnp.maximum(denom, 1.0)

    # ── inference ─────────────────────────────────────────────────────────

    def sample(
        self,
        variables: Any,
        cond: jnp.ndarray,
        text_ids: jnp.ndarray,
        duration: jnp.ndarray,
        lens: jnp.ndarray,
        steps: int = 32,
        cfg_strength: float = 1.0,
        sway_sampling_coef: float | None = None,
        seed: int | jax.Array | None = None,
        noise: jnp.ndarray | None = None,
        return_trajectory: bool = False,
        max_duration: int = 65536,
        hoist_t_mods: bool = True,
        cfg_interval: tuple[float, float] | None = None,
        method: str = "euler",
    ) -> tuple[jnp.ndarray, jnp.ndarray | None]:
        """Euler-ODE generation.

        Args:
            cond: conditioning mel, zero-padded to the full length [B, T, M].
            text_ids: [B, T] stretched token ids.
            duration: [B] total lengths (cond length T must be >= max).
            lens: [B] reference-audio lengths (frames [0:lens[i]] conditioning).
            noise: optional [B, T, M] initial noise (parity tests / seeding).
            cfg_interval: optional (lo, hi) guidance interval (Kynkäänniemi
                et al. 2024, arXiv:2404.07724): CFG — the batch-doubled
                cond+uncond forward and the guided combine — applies only
                at Euler steps whose timestep t falls in [lo, hi]; the
                other steps run a single cond-only forward (half the
                DiT rows). None (the default, and the reference's
                behavior, flow.py:244-267) guides every step; (0.0, 1.0)
                is numerically identical to None. An opt-in throughput
                lever: the step membership is decided statically from
                the sway-warped grid, so the Euler scan just splits into
                up to three segments — no per-step branching.
            method: ``"euler"`` (the reference's solver, flow.py:290-301)
                or ``"midpoint"`` (explicit midpoint, 2nd order — the
                other solver upstream F5-TTS exposes): two velocity
                evaluations per step, so S midpoint steps cost 2·S NFE
                but the truncation error falls as 1/S² instead of 1/S.
                Trajectory rows are per STEP either way.

        Returns:
            (mel [B, T, M], trajectory [steps+1, B, T, M] or None)
        """
        if steps < 1:
            raise ValueError(f"steps must be >= 1, got {steps}")
        if method not in ("euler", "midpoint"):
            raise ValueError(
                f"method must be 'euler' or 'midpoint', got {method!r}"
            )
        if cfg_strength < 0:
            raise ValueError(f"cfg_strength must be >= 0, got {cfg_strength}")
        if cfg_interval is not None:
            lo, hi = float(cfg_interval[0]), float(cfg_interval[1])
            if not (0.0 <= lo <= hi):
                raise ValueError(
                    f"cfg_interval must satisfy 0 <= lo <= hi, got "
                    f"{cfg_interval}"
                )
        batch, max_dur, n_mels = cond.shape
        if max_dur > max_duration:
            raise ValueError(f"duration exceeds max_duration={max_duration}")
        # host-side validation when inputs are concrete (flow.py:191-230);
        # only traced inputs skip it (shapes are still statically bounded)

        if not isinstance(duration, jax.core.Tracer) and not isinstance(
            lens, jax.core.Tracer
        ):
            d = _np.asarray(duration)
            ln = _np.asarray(lens)
            if d.size != batch or ln.size != batch:
                raise ValueError("duration/lens must have one value per sample")
            if (d <= 0).any():
                raise ValueError("duration values must be > 0")
            if (ln < 0).any():
                raise ValueError("lens values must be >= 0")
            if (ln > d).any():
                raise ValueError(
                    "conditioning lens must be <= duration for every sample"
                )
            if (d > max_dur).any():
                raise ValueError("duration must be <= padded cond length")
        duration = jnp.asarray(duration).astype(jnp.int32)
        lens = jnp.asarray(lens).astype(jnp.int32)

        cond_mask = lens_to_mask(lens, max_dur)[..., None]
        step_cond = jnp.where(cond_mask, cond, 0.0)
        attn_mask = lens_to_mask(duration, max_dur)

        if noise is None:
            if seed is None:
                key = jax.random.PRNGKey(0)
            elif isinstance(seed, int):
                key = jax.random.PRNGKey(seed)
            else:
                key = jnp.asarray(seed)
            if key.ndim == 2:  # [B, 2]: one key per row (batch-invariant)
                noise = per_row_noise(key, max_dur, n_mels, cond.dtype)
            else:
                noise = per_sample_noise(
                    key, batch, max_dur, n_mels, cond.dtype
                )
        # padding region starts at zero like the reference's pad_sequence
        y0 = jnp.where(attn_mask[..., None], noise, 0.0)

        te_cond = self.backbone.apply(
            variables, text_ids, max_dur, False, method="embed_text"
        )
        te_uncond = self.backbone.apply(
            variables, text_ids, max_dur, True, method="embed_text"
        )

        t_grid = sway_timesteps(steps, sway_sampling_coef, dtype=cond.dtype)
        use_cfg = cfg_strength >= 1e-5

        if hoist_t_mods:
            # every t-dependent matmul (timestep MLP + all AdaLN
            # projections) over the WHOLE static step schedule, computed
            # once before the loop; the body slices one row per step
            # (dit.precompute_t_mods — ~1/3 of weight HBM traffic removed
            # from every Euler step). Midpoint hoists its half-step
            # evaluation points too (rows [steps:2·steps] of the tables).
            from oron_tts_tpu.models.dit import precompute_t_mods

            hoist_grid = t_grid[:-1]
            if method == "midpoint":
                hoist_grid = jnp.concatenate(
                    [hoist_grid, (t_grid[:-1] + t_grid[1:]) / 2]
                )
            te_time = self.backbone.apply(
                variables, hoist_grid, method="embed_time"
            )
            block_mods, final_mods = precompute_t_mods(
                variables["params"], te_time, self.backbone.depth,
                self.backbone.scan_blocks, self.backbone.dtype,
            )

        def make_step(seg_cfg: bool):
            def velocity(
                x: jnp.ndarray, t_val: jnp.ndarray, mod_idx: jnp.ndarray
            ) -> jnp.ndarray:
                t_b = jnp.broadcast_to(t_val, (batch,))
                tm = (
                    (block_mods[:, mod_idx], final_mods[mod_idx])
                    if hoist_t_mods else None
                )
                if not seg_cfg:
                    return self.backbone.apply(
                        variables, x, step_cond, text_ids, t_b,
                        mask=attn_mask, text_embed=te_cond, t_mods=tm,
                    )
                pred, null = self.backbone.apply(
                    variables, x, step_cond, te_cond, te_uncond, t_b,
                    attn_mask, method="forward_cfg", t_mods=tm,
                )
                return pred + (pred - null) * cfg_strength

            def euler_step(x: jnp.ndarray, i: jnp.ndarray):
                dt = t_grid[i + 1] - t_grid[i]
                v = velocity(x, t_grid[i], i)
                x_next = x + v * dt
                return x_next, (x_next if return_trajectory else None)

            def midpoint_step(x: jnp.ndarray, i: jnp.ndarray):
                # explicit midpoint (2nd order): k1 probes, k2 advances
                dt = t_grid[i + 1] - t_grid[i]
                k1 = velocity(x, t_grid[i], i)
                k2 = velocity(
                    x + k1 * (dt / 2), t_grid[i] + dt / 2, steps + i
                )
                x_next = x + k2 * dt
                return x_next, (x_next if return_trajectory else None)

            return euler_step if method == "euler" else midpoint_step

        # Segment the step range by static CFG membership: with a
        # guidance interval the (monotonic) sway-warped grid yields at
        # most three contiguous runs — cond-only, guided, cond-only.
        # Membership is decided host-side in float64 on the same grid
        # the integrator steps on (sway_timesteps_host); a boundary step
        # flipping by float error would merely move one step between
        # regimes, never change the math of either. Without an interval
        # this is ONE segment — the exact scan the sampler always ran.
        if use_cfg and cfg_interval is not None:
            t_np = sway_timesteps_host(steps, sway_sampling_coef)[:-1]
            in_cfg = (t_np >= lo) & (t_np <= hi)
            bounds = [0] + [
                i for i in range(1, steps) if in_cfg[i] != in_cfg[i - 1]
            ] + [steps]
            segments = [
                (a, b, bool(in_cfg[a])) for a, b in zip(bounds, bounds[1:])
            ]
        else:
            segments = [(0, steps, use_cfg)]

        x_final = y0
        traj_parts = []
        for start, stop, seg_cfg in segments:
            x_final, tr = jax.lax.scan(
                make_step(seg_cfg), x_final,
                jnp.arange(start, stop), unroll=1,
            )
            if return_trajectory:
                traj_parts.append(tr)
        out = jnp.where(cond_mask, cond, x_final)
        if return_trajectory:
            trajectory = jnp.concatenate([y0[None], *traj_parts], axis=0)
        else:
            trajectory = None
        return out, trajectory
