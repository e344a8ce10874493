"""Host-side input pipeline: threaded sample loading + device prefetch.

Parity target: the reference trains through torch DataLoader worker
processes (train.py:1512-1514 accelerator.prepare) and overlaps VAE encode
with DiT compute on extra CUDA streams (train.py:1639-1645). On TPU the
equivalents are: a thread pool hiding video-decode latency (IO releases the
GIL in cv2/decord and in the C++ frame ops), batch collation on host, and
`device_prefetch` keeping N batches in flight so the host never blocks the
device (XLA dispatch is async; jnp.asarray uploads overlap compute).
"""
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional, Sequence

import numpy as np


def default_collate(items: Sequence[dict]) -> dict:
    """Stack same-key numpy arrays; pass through non-array values as lists."""
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out


class DataLoader:
    """Minimal threaded loader: pulls indices from a sampler, loads samples
    with `num_workers` threads, yields collated batches in order."""

    def __init__(self, dataset, batch_sampler: Iterable[Sequence[int]],
                 num_workers: int = 4,
                 collate_fn: Callable = default_collate,
                 prefetch_batches: int = 2):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.collate_fn = collate_fn
        self.prefetch_batches = max(1, prefetch_batches)

    def __iter__(self) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(self.prefetch_batches)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in self.batch_sampler:
                    if stop.is_set():
                        break
                    items = list(pool.map(self.dataset.__getitem__,
                                          batch_idx))
                    q.put(self.collate_fn(items))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def device_prefetch(it: Iterator[dict], size: int = 2,
                    transform: Optional[Callable] = None) -> Iterator[dict]:
    """Keep `size` batches uploaded ahead of consumption. XLA transfers are
    async, so converting early overlaps H2D with the previous step's compute
    (the TPU analogue of the reference's extra CUDA streams)."""
    import collections

    import jax.numpy as jnp

    buf = collections.deque()

    def upload(b):
        b = transform(b) if transform else b
        return {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                for k, v in b.items()}

    for b in it:
        buf.append(upload(b))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
