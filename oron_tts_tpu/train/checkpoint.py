"""Checkpointing with the reference's on-disk contract.

Native format: a single ``.npz`` per checkpoint holding flattened pytrees
(``params/...``, ``ema/...``, ``opt/...``) plus scalar metadata, named
``f5tts_step_{step:08d}.npz`` with ``f5tts_best.npz`` and a ``config.json``
sidecar — mirroring reference src/utils/checkpoint.py:62-228 (rotation of
``max_checkpoints`` step files, best tracking, fresh-state on missing file).
Torch ``.pt``/``.safetensors`` checkpoints from the reference are readable
via utils.torch_compat for weight import.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Mapping

import jax
import numpy as np

_SEP = "/"


def flatten_tree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    flat: dict[str, np.ndarray] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            key = f"{prefix}{_SEP}{k}" if prefix else str(k)
            flat.update(flatten_tree(v, key))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            key = f"{prefix}{_SEP}#{i}" if prefix else f"#{i}"
            flat.update(flatten_tree(v, key))
    else:
        flat[prefix] = np.asarray(tree)
    return flat


def unflatten_tree(flat: Mapping[str, np.ndarray]) -> Any:
    root: dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def resolve(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            # indices may be sparse: leafless subtrees (e.g. optax EmptyState)
            # contribute no entries; consumers rebuild exact structure via
            # tree_unflatten over the leaf sequence
            items = sorted(node.items(), key=lambda kv: int(kv[0][1:]))
            return [resolve(v) for _, v in items]
        return {k: resolve(v) for k, v in node.items()}

    return resolve(root)


def host_snapshot(trees: Mapping[str, Any],
                  meta: Mapping[str, Any] | None = None) -> dict[str, np.ndarray]:
    """Fetch trees to host numpy NOW (donation-safe) as the flat npz dict.

    The device_get must happen before the next donated train step
    invalidates the state buffers; the disk write (``write_npz``) carries
    no device dependency and may run later on a writer thread.

    bfloat16 leaves (e.g. Adam mu under ``adam_mu_dtype: bfloat16``) are
    stored as uint16 views with their keys recorded in the metadata —
    np.savez has no bfloat16 and would silently write a void dtype that
    neither numpy nor JAX can interpret on load.
    """
    import ml_dtypes

    def owned(leaf: Any) -> Any:
        # device_get on an ALREADY-host numpy leaf is identity (no copy)
        # — e.g. a ZeRO-1-gathered opt state; a deferred write would then
        # alias memory the caller may mutate, so take an owned copy
        out = jax.device_get(leaf)
        if out is leaf and isinstance(out, np.ndarray):
            out = out.copy()
        return out

    flat: dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        if tree is None:
            continue
        flat.update(flatten_tree(jax.tree_util.tree_map(owned, tree), name))
    bf16_keys = []
    for key, value in flat.items():
        if value.dtype == ml_dtypes.bfloat16:
            flat[key] = value.view(np.uint16)
            bf16_keys.append(key)
    full_meta = dict(meta or {})
    if bf16_keys:
        full_meta["__bf16__"] = bf16_keys
    if full_meta:
        flat["__meta__"] = np.frombuffer(
            json.dumps(full_meta).encode(), dtype=np.uint8
        )
    return flat


def write_npz(path: str | Path, flat: Mapping[str, np.ndarray]) -> None:
    """Atomic npz write (tmp file + rename) of a host_snapshot dict."""
    tmp = Path(path).with_name(".tmp-" + Path(path).name)
    np.savez(tmp, **flat)
    tmp.replace(path)


def save_pytree_npz(path: str | Path, trees: Mapping[str, Any],
                    meta: Mapping[str, Any] | None = None) -> None:
    """trees: name → pytree, e.g. {"params": ..., "ema": ..., "opt": ...}."""
    write_npz(path, host_snapshot(trees, meta))


def load_pytree_npz(path: str | Path) -> tuple[dict[str, Any], dict[str, Any]]:
    """Returns ({name: pytree}, meta)."""
    import ml_dtypes

    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    meta: dict[str, Any] = {}
    raw_meta = flat.pop("__meta__", None)
    if raw_meta is not None:
        meta = json.loads(raw_meta.tobytes().decode())
    for key in meta.pop("__bf16__", []):
        if key in flat:
            flat[key] = flat[key].view(ml_dtypes.bfloat16)
    for key, value in flat.items():
        # checkpoints written before the bf16 marker stored bf16 as a raw
        # void dtype; the only 2-byte void producer here was bfloat16
        if value.dtype.kind == "V" and value.dtype.itemsize == 2:
            flat[key] = value.view(ml_dtypes.bfloat16)
    groups: dict[str, dict[str, np.ndarray]] = {}
    for key, value in flat.items():
        name, _, rest = key.partition(_SEP)
        groups.setdefault(name, {})[rest] = value
    return {name: unflatten_tree(g) for name, g in groups.items()}, meta


def _is_step_checkpoint(name: str, model_name: str) -> bool:
    return re.fullmatch(rf"{re.escape(model_name)}_step_\d{{8}}\.npz", name) is not None


def stale_remote_checkpoint_paths(
    remote_paths: list[str], local_paths: list[str], model_name: str
) -> list[str]:
    """Remote step checkpoints no longer in the local rotation (for hub sync)."""
    local = {
        Path(p).name for p in local_paths if _is_step_checkpoint(Path(p).name, model_name)
    }
    return [
        p for p in remote_paths
        if _is_step_checkpoint(Path(p).name, model_name) and Path(p).name not in local
    ]


class CheckpointManager:
    """Rotating checkpoints, optionally with asynchronous disk writes.

    With ``async_writes=True`` the device→host snapshot still happens
    inside ``save``/``save_best`` (the donated train step invalidates the
    state buffers right after), but the multi-GB ``np.savez`` + rotation
    run on a single background writer thread, so the training loop only
    pays tunnel-fetch time, not disk time. One write is in flight at a
    time (a second save joins the first — bounds host memory to one
    snapshot); every read-side entry point (``load``,
    ``latest_checkpoint``, ``push_to_hub``) joins the writer first so no
    caller can observe a half-written rotation. Writer failures re-raise
    on the next ``save``/``wait`` rather than vanishing on the thread.
    """

    def __init__(
        self,
        checkpoint_dir: str | Path,
        model_name: str = "f5tts",
        max_checkpoints: int = 5,
        async_writes: bool = False,
    ) -> None:
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.model_name = model_name
        self.max_checkpoints = max_checkpoints
        self.async_writes = async_writes
        self._writer: Any = None  # threading.Thread | None
        self._writer_error: BaseException | None = None

    def wait(self) -> None:
        """Block until any in-flight async write finishes; re-raise its error."""
        if self._writer is not None:
            self._writer.join()
            self._writer = None
        if self._writer_error is not None:
            err, self._writer_error = self._writer_error, None
            raise err

    def _run_write(self, fn) -> None:
        if not self.async_writes:
            fn()
            return
        import threading

        self.wait()

        def job() -> None:
            try:
                fn()
            except BaseException as e:  # surfaced by the next wait()/save
                self._writer_error = e

        # non-daemon: a normal interpreter exit joins it, so no truncated
        # checkpoint survives an end-of-run race
        self._writer = threading.Thread(
            target=job, name="ckpt-writer", daemon=False
        )
        self._writer.start()

    def step_path(self, step: int) -> Path:
        return self.checkpoint_dir / f"{self.model_name}_step_{step:08d}.npz"

    def best_path(self) -> Path:
        return self.checkpoint_dir / f"{self.model_name}_best.npz"

    def config_path(self) -> Path:
        return self.checkpoint_dir / "config.json"

    def save(
        self,
        step: int,
        params: Any,
        opt_state: Any = None,
        ema_params: Any = None,
        loss: float | None = None,
        config: Mapping[str, Any] | None = None,
        is_best: bool = False,
        extra_state: Mapping[str, Any] | None = None,
    ) -> Path:
        meta: dict[str, Any] = {"step": step, "loss": loss}
        if extra_state:
            meta.update(extra_state)
        trees = {"params": params, "opt": opt_state, "ema": ema_params}
        path = self.step_path(step)
        flat = host_snapshot(trees, meta)  # before donation invalidates
        if config is not None:
            self.config_path().write_text(json.dumps(dict(config), indent=2))

        def write() -> None:
            write_npz(path, flat)
            if is_best:
                write_npz(self.best_path(), flat)
            self._rotate()

        self._run_write(write)
        return path

    def save_best(
        self,
        step: int,
        params: Any,
        opt_state: Any = None,
        ema_params: Any = None,
        loss: float | None = None,
        config: Mapping[str, Any] | None = None,
        extra_state: Mapping[str, Any] | None = None,
    ) -> Path:
        """Write ONLY ``f5tts_best.npz`` (no step file, no rotation).

        Best-val epochs between ``save_interval`` boundaries would
        otherwise be lost forever: the reference only materializes the
        best checkpoint on interval epochs (trainer.py:397-399), so a
        minimum at epoch 7 with save_interval=5 never reaches disk.

        ``config.json`` is written here too: a run preempted before its
        first interval save may leave ``f5tts_best.npz`` as the dir's
        only checkpoint, and without the config beside it ``oron-infer``
        would rebuild the default (Base) architecture and fail on a
        non-default model with an opaque tree mismatch."""
        meta: dict[str, Any] = {"step": step, "loss": loss}
        if extra_state:
            meta.update(extra_state)
        trees = {"params": params, "opt": opt_state, "ema": ema_params}
        flat = host_snapshot(trees, meta)
        if config is not None:
            self.config_path().write_text(json.dumps(dict(config), indent=2))
        self._run_write(lambda: write_npz(self.best_path(), flat))
        return self.best_path()
        return self.best_path()

    def load(
        self,
        path: str | Path | None = None,
        load_best: bool = False,
    ) -> dict[str, Any]:
        """Returns {params, opt, ema, step, loss, ...}; fresh dict if missing."""
        self.wait()
        if path is None:
            path = self.best_path() if load_best else self.latest_checkpoint()
        if path is None or not Path(path).exists():
            return {"step": 0, "loss": None, "params": None, "ema": None, "opt": None}
        trees, meta = load_pytree_npz(path)
        out: dict[str, Any] = {
            "params": trees.get("params"),
            "opt": trees.get("opt"),
            "ema": trees.get("ema"),
        }
        out.update(meta)
        out.setdefault("step", 0)
        return out

    def load_config(self) -> dict[str, Any] | None:
        if self.config_path().exists():
            return json.loads(self.config_path().read_text())
        return None

    def _step_checkpoints(self) -> list[Path]:
        out = []
        for p in self.checkpoint_dir.glob(f"{self.model_name}_step_*.npz"):
            if _is_step_checkpoint(p.name, self.model_name):
                out.append(p)
        return sorted(out, key=lambda p: int(p.stem.rsplit("_", 1)[-1]))

    def latest_checkpoint(self) -> Path | None:
        self.wait()
        ckpts = self._step_checkpoints()
        return ckpts[-1] if ckpts else None

    def _rotate(self) -> None:
        ckpts = self._step_checkpoints()
        while len(ckpts) > self.max_checkpoints:
            ckpts[0].unlink()
            ckpts.pop(0)

    # ── hub mirroring (parity with reference checkpoint.py:299-365) ──────

    def push_to_hub(
        self,
        repo_id: str,
        token: str | None = None,
        private: bool = False,
        log_dir: str | Path | None = None,
    ) -> str:
        from huggingface_hub import HfApi

        self.wait()  # never upload a half-written rotation
        card = self.checkpoint_dir / "README.md"
        card.write_text(self._model_card(), encoding="utf-8")
        api = HfApi()
        api.create_repo(repo_id=repo_id, token=token, private=private, exist_ok=True)
        api.upload_folder(
            folder_path=str(self.checkpoint_dir), repo_id=repo_id, token=token
        )
        self._cleanup_remote(api, repo_id, token)
        if log_dir is not None and Path(log_dir).exists():
            if any(p.is_file() for p in Path(log_dir).rglob("*")):
                api.upload_folder(
                    folder_path=str(log_dir), repo_id=repo_id,
                    path_in_repo="tb_logs", token=token,
                )
        return f"https://huggingface.co/{repo_id}"

    def _cleanup_remote(self, api: Any, repo_id: str, token: str | None) -> None:
        local = [p.name for p in
                 self.checkpoint_dir.glob(f"{self.model_name}_step_*.npz")]
        info = api.model_info(repo_id=repo_id, token=token, files_metadata=False)
        remote = [s.rfilename for s in (info.siblings or [])]
        stale = stale_remote_checkpoint_paths(remote, local, self.model_name)
        if stale:
            api.delete_files(
                repo_id=repo_id, repo_type="model", delete_patterns=stale,
                token=token,
                commit_message=f"Remove {len(stale)} stale {self.model_name} checkpoints",
            )

    def pull_from_hub(
        self, repo_id: str, filename: str = "f5tts_best.npz",
        token: str | None = None,
    ) -> Path:
        from huggingface_hub import hf_hub_download

        return Path(hf_hub_download(
            repo_id=repo_id, filename=filename, token=token,
            local_dir=str(self.checkpoint_dir),
        ))

    def _model_card(self) -> str:
        config = self.load_config() or {}
        m = config.get("model", {})
        return f"""---
language:
  - mn
  - kk
license: mit
tags:
  - tts
  - text-to-speech
  - mongolian
  - kazakh
  - flow-matching
  - f5-tts
  - jax
library_name: jax
pipeline_tag: text-to-speech
---

# OronTTS-TPU — F5-TTS for Mongolian & Kazakh (JAX/TPU)

Non-autoregressive TTS based on F5-TTS (flow matching + DiT), TPU-native.

| Parameter | Value |
|-----------|-------|
| dim | {m.get("dim", "?")} |
| depth | {m.get("depth", "?")} |
| heads | {m.get("heads", "?")} |
| vocab_size | {m.get("vocab_size", 65)} |
| sample_rate | {config.get("sample_rate", 24000)} Hz |
| mel_bins | {config.get("n_mels", 100)} |
"""
