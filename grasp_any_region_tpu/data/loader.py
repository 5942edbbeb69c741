"""Prefetching data loader: overlap host preprocessing with device steps.

The reference leans on torch's multiprocessing DataLoader (num_workers=4 +
LengthGroupedSampler, configs/gar_1b.py:110-120). Here a THREAD pool does
the same job without pickling/fork overhead: the expensive per-sample work —
RLE mask decode (native/rle.cc), bicubic tiling (native/resize.cc) — runs in
C++ through ctypes, which releases the GIL, so worker threads genuinely run
in parallel with each other and with the (blocking) device step.

Order and failure semantics:
  * batches are yielded strictly in sampler order (futures are consumed
    FIFO; prefetch depth only controls how far ahead workers run);
  * a sample that raises propagates at the batch that contains it — no
    silent refetch loop (the reference's GraspAnyRegion_Dataset.py:727-739
    swallows all exceptions and resamples; our dataset handles per-item
    fallback itself where appropriate).
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, List, Optional, Sequence

__all__ = ["PrefetchLoader"]


class PrefetchLoader:
    """Iterate `dataset[i]` for i in `indices`, `batch_size` at a time,
    building samples on a thread pool `prefetch_batches` ahead of the
    consumer and collating with `collate_fn(list_of_samples)`."""

    def __init__(
        self,
        dataset,
        indices: Sequence[int],
        *,
        batch_size: int,
        collate_fn: Callable[[List], object],
        num_workers: int = 4,
        prefetch_batches: int = 2,
        drop_last: bool = False,
    ):
        assert batch_size >= 1 and num_workers >= 1 and prefetch_batches >= 1
        self.dataset = dataset
        self.indices = list(indices)
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.num_workers = num_workers
        self.prefetch_batches = prefetch_batches
        self.drop_last = drop_last

    def _batches(self) -> List[List[int]]:
        bs = self.batch_size
        out = [self.indices[i:i + bs] for i in range(0, len(self.indices), bs)]
        if self.drop_last and out and len(out[-1]) < bs:
            out.pop()
        return out

    def __len__(self) -> int:
        return len(self._batches())

    def __iter__(self) -> Iterator:
        batches = self._batches()
        if not batches:
            return
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending: List[List[Future]] = []
            submitted = 0

            def top_up():
                nonlocal submitted
                while (submitted < len(batches)
                       and len(pending) < self.prefetch_batches):
                    pending.append([
                        pool.submit(self.dataset.__getitem__, i)
                        for i in batches[submitted]
                    ])
                    submitted += 1

            top_up()
            while pending:
                futs = pending.pop(0)
                top_up()  # keep workers busy while we block on the head
                samples = [f.result() for f in futs]
                yield self.collate_fn(samples)
