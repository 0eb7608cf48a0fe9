"""Multi-host input pipeline: DCN-sharded .dax loading feeding a global
device mesh.

The reference feeds its pipeline with an mp.Pool of workers that each
open, read, and de-interleave one hyb's .dax movie from shared storage
(classes/batch_functions.py:60-302 batch_process_image_to_spots;
classes/field_of_view.py:1128-1142 fan-out).  On a multi-host TPU pod
the equivalent is: every *host* reads only the FOV files whose batch
rows land on its local devices (DCN carries only file bytes from
storage, never device tensors), a background prefetch thread hides the
read latency behind device compute, and
`jax.make_array_from_process_local_data` assembles the per-host arrays
into one global jax.Array sharded over the mesh's data axis — XLA then
runs the usual single-controller program over it (SURVEY §2.11/§5).

Pieces (each independently testable single-process by passing explicit
`process_index` / `process_count`):

  * `shard_fovs` — deterministic contiguous partition of the FOV list
    across hosts, balanced to ±1;
  * `FovPrefetcher` — background thread reading this host's shard
    through a ring of reusable staging-buffer sets (`read_dax(out=)` /
    `split_channels(out=)`), with free-list backpressure and fail-stop
    error relay;
  * `assemble_global_batch` — local `(B_local, ...)` block →
    global `(B, ...)` jax.Array sharded `P(axis)` over the mesh;
  * `prefetch_to_device` — host→device upload of each item overlapped
    with the consumer's (asynchronously dispatched) device compute.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..io.dax import read_inf
from ..io.native_loader import load_dax_channels


def shard_fovs(fov_names: Sequence[str],
               process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> List[str]:
    """This host's contiguous slice of the FOV list.

    Contiguous (not strided) so each host scans one disk region, and
    balanced to ±1: the first `len % count` hosts take one extra.  With
    `jax.process_count() == 1` this is the whole list, so single-host
    runs need no special casing.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if not 0 <= pi < pc:
        raise ValueError(f"process_index {pi} not in [0, {pc})")
    n = len(fov_names)
    base, extra = divmod(n, pc)
    start = pi * base + min(pi, extra)
    stop = start + base + (1 if pi < extra else 0)
    return list(fov_names[start:stop])


@dataclass
class PrefetchItem:
    """One prefetched FOV.  `array` is a staging buffer on loan: it is
    valid until `release()` — which the iterator also calls implicitly
    when the next item is pulled, so plain `for item in prefetcher`
    loops are safe as long as each item is consumed (e.g. uploaded)
    before advancing.  Call `release()` early to unblock the reader
    sooner; it is idempotent."""
    name: str
    array: np.ndarray
    _release: Callable[[], None] = field(repr=False, default=lambda: None)
    _released: bool = field(default=False, repr=False)

    def release(self) -> None:
        if not self._released:
            self._released = True
            self._release()


class FovPrefetcher:
    """Background reader for this host's FOV shard.

    Yields :class:`PrefetchItem`s carrying `(C, Z, X, Y)` uint16 arrays
    in shard order.  A single reader thread cycles `depth`
    staging-buffer sets (read with `read_dax(out=)`, de-interleaved
    with `split_channels(out=)`), so steady-state reads allocate
    nothing; a free-list of buffer sets applies backpressure — the
    reader never overwrites a buffer before the item borrowing it is
    released.  Read errors are re-raised at the consumer's next pull,
    never swallowed.
    """

    _DONE = object()

    def __init__(self, paths: Sequence[str], channels: Sequence[str],
                 n_z: int, buffer_frames: int = 10,
                 empty_frames: int = 0, skip_frame0: bool = False,
                 depth: int = 2):
        if depth < 2:
            raise ValueError("depth must be >= 2 (double buffering)")
        self._paths = list(paths)
        self._channels = [str(c) for c in channels]
        self._n_z = n_z
        self._buffer_frames = buffer_frames
        self._empty_frames = empty_frames
        self._skip_frame0 = skip_frame0
        self._depth = depth
        self._data_q: "queue.Queue" = queue.Queue()
        self._free_q: "queue.Queue" = queue.Queue()
        self._thread: Optional[threading.Thread] = None

    def _run(self) -> None:
        frame_shape = None
        try:
            for path in self._paths:
                meta = read_inf(path)
                if meta.frame_shape != frame_shape:
                    # (re)build the ring; any still-borrowed old buffers
                    # stay alive with their items and are dropped on
                    # release (shape changes mid-experiment are rare)
                    frame_shape = meta.frame_shape
                    self._free_q = queue.Queue()
                    for _ in range(self._depth):
                        self._free_q.put(np.empty(
                            (len(self._channels), self._n_z) + frame_shape,
                            np.uint16))
                out = self._free_q.get()        # backpressure point
                # fused native read+de-interleave (one parallel pass,
                # frames land straight in their channel slots); falls
                # back to read_dax + split_channels without a toolchain
                load_dax_channels(path, self._channels, self._channels,
                                  n_z=self._n_z,
                                  buffer_frames=self._buffer_frames,
                                  empty_frames=self._empty_frames,
                                  skip_frame0=self._skip_frame0,
                                  meta=meta, out=out)
                self._data_q.put((path, out))
            self._data_q.put(self._DONE)
        except BaseException as e:          # noqa: BLE001 — relayed
            self._data_q.put(e)

    def __iter__(self) -> Iterator[PrefetchItem]:
        if self._thread is not None:
            raise RuntimeError("FovPrefetcher is single-use")
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="fov-prefetcher")
        self._thread.start()
        prev: Optional[PrefetchItem] = None
        while True:
            item = self._data_q.get()
            if item is self._DONE:
                self._thread.join()
                return
            if isinstance(item, BaseException):
                self._thread.join()
                raise RuntimeError("prefetcher read failed") from item
            path, buf = item
            free_q = self._free_q               # bind current ring
            out = PrefetchItem(path, buf,
                               _release=lambda b=buf, q=free_q: q.put(b))
            if prev is not None:
                prev.release()
            prev = out
            yield out


def assemble_global_batch(local_batch: np.ndarray, mesh: Mesh,
                          axis: str = "data") -> jax.Array:
    """Per-host `(B_local, ...)` block -> global `(B, ...)` jax.Array
    sharded `P(axis)` over the mesh.

    Each host passes only the rows it loaded (its `shard_fovs` slice,
    in order); rows concatenate in process order, which matches
    `shard_fovs`'s contiguous partition, so global row i is FOV i.
    Single-process meshes (including the 8-virtual-device CPU test
    mesh) are the degenerate case where local == global.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_batch))


def prefetch_to_device(items: Iterable[PrefetchItem], sharding=None,
                       ) -> Iterator[Tuple[str, jax.Array]]:
    """Upload each prefetched FOV and release its staging buffer once
    the transfer lands.

    The consumer pattern `for name, dev in prefetch_to_device(pf): ...`
    overlaps three stages: the reader thread fills buffer k+1 while
    this generator uploads buffer k and the consumer's previously
    dispatched device work (k-1) runs — provided the consumer does not
    block on its own results inside the loop.  The upload is fenced
    (`block_until_ready`) before the buffer is released.  On a
    host-backed target (the CPU test mesh) `device_put` ALIASES the
    numpy buffer outright — fencing does not help — so there the array
    is copied first; on an accelerator the DMA lands in device memory
    and the staging buffer goes straight back to the ring, keeping the
    zero-copy path where it matters.  `sharding` optionally places each
    upload (e.g. replicated, or a per-host device)."""
    if sharding is not None:
        host_backed = all(d.platform == "cpu"
                          for d in sharding.device_set)
    else:
        host_backed = jax.devices()[0].platform == "cpu"
    for item in items:
        src = item.array.copy() if host_backed else item.array
        dev = jax.device_put(src, sharding)
        jax.block_until_ready(dev)
        item.release()
        yield item.name, dev
