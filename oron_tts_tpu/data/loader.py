"""Threaded prefetching data loader (replaces torch DataLoader workers).

Host-side decode + mel extraction runs in a thread pool (numpy FFT releases
the GIL) while the accelerator consumes the previous batch. Failed samples
are skipped with a warning, matching the reference's guard-based robustness.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Iterable, Iterator

_logger = logging.getLogger(__name__)


class DataLoader:
    def __init__(
        self,
        dataset: Any,
        batch_sampler: Iterable[list[int]],
        collate_fn: Callable[[list[dict]], dict],
        num_workers: int = 2,
        prefetch: int = 2,
    ) -> None:
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.collate_fn = collate_fn
        self.num_workers = max(0, num_workers)
        self.prefetch = max(1, prefetch)

    def __len__(self) -> int:
        return len(self.batch_sampler)  # type: ignore[arg-type]

    @staticmethod
    def _split_entry(entry) -> tuple[list[int], dict]:
        """Sampler entries are index lists, or (indices, collate_kwargs)
        pairs from GlobalBatchSchedule (globally agreed pad targets)."""
        if isinstance(entry, tuple) and len(entry) == 2 and isinstance(entry[1], dict):
            return list(entry[0]), entry[1]
        return list(entry), {}

    def _build(self, indices: list[int], collate_kwargs: dict) -> dict | None:
        items = []
        for i in indices:
            try:
                items.append(self.dataset[i])
            except Exception as exc:  # guard-based skip (trainer parity)
                _logger.warning("Skipping sample %d: %s", i, exc)
        if not items and not collate_kwargs.get("pad_t_to"):
            return None
        # with a scheduled shape, even an all-failed batch must be emitted
        # (as pure padding) — other hosts expect this step's collective
        return self.collate_fn(items, **collate_kwargs)

    def __iter__(self) -> Iterator[dict]:
        if self.num_workers == 0:
            for entry in self.batch_sampler:
                batch = self._build(*self._split_entry(entry))
                if batch is not None:
                    yield batch
            return

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        # submit lazily so at most num_workers + prefetch batches are in
        # flight — bounds host memory regardless of dataset size
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending: deque = deque()
            it = iter(self.batch_sampler)
            exhausted = False
            while True:
                while not exhausted and len(pending) < self.num_workers + self.prefetch:
                    try:
                        entry = next(it)
                    except StopIteration:
                        exhausted = True
                        break
                    pending.append(pool.submit(self._build, *self._split_entry(entry)))
                if not pending:
                    break
                batch = pending.popleft().result()
                if batch is not None:
                    yield batch
