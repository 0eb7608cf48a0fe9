"""Per-FOV HDF5 result store: the pipeline's checkpoint.

Behavior target: the reference's per-FOV `.hdf5` savefile
(classes/field_of_view.py:374-410, 1160-1708; classes/batch_functions.py:
305-493): root attrs carry fov_info; one group per data_type ('unique',
'combo', ...) holding parallel datasets `ids`, `channels`, `flags`,
`drifts`, `spots`, `raw_spots` (and optionally `ims`); plus `segmentation`
group.  Flags: 0 = empty, 1 = spots saved with uncorrected coords,
2 = fully corrected (reference classes/batch_functions.py:348-355).

Differences by design: the reference guards one file with a process-wide
RLock because many workers mutate it concurrently; here a single controller
owns the file, so writes are plain h5py calls and resume = reading `flags`.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import numpy as np

FLAG_EMPTY = 0
FLAG_RAW = 1
FLAG_CORRECTED = 2

_SPOT_COLS = 11


class FovStore:
    """One field of view's persistent results."""

    def __init__(self, path: str, mode: str = "a"):
        self.path = path
        self._fh = h5py.File(path, mode)

    # -- lifecycle -------------------------------------------------------

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def flush(self):
        self._fh.flush()

    # -- fov info --------------------------------------------------------

    def set_fov_info(self, **attrs):
        for k, v in attrs.items():
            self._fh.attrs[k] = v

    def get_fov_info(self) -> Dict:
        return dict(self._fh.attrs)

    # -- data-type groups ------------------------------------------------

    def init_data_type(self, data_type: str, region_ids: Sequence[int],
                       channels: Sequence[str], spot_capacity: int,
                       overwrite: bool = False):
        """Create (or open) a data_type group with per-region rows."""
        n = len(region_ids)
        if data_type in self._fh:
            if not overwrite:
                return
            del self._fh[data_type]
        g = self._fh.create_group(data_type)
        g.create_dataset("ids", data=np.asarray(region_ids, np.int32))
        g.create_dataset("channels", data=np.array(
            [str(c) for c in channels], dtype="S8"))
        g.create_dataset("flags", data=np.zeros(n, np.int32))
        g.create_dataset("drifts", data=np.zeros((n, 3), np.float32))
        # drift quality: 0 = crop consensus, 1 = fallback (suspicious) —
        # the reference's first-class drift outcome
        # (correction_tools/alignment.py:676-693)
        g.create_dataset("drift_flags", data=np.zeros(n, np.int32))
        g.create_dataset("spots",
                         shape=(n, spot_capacity, _SPOT_COLS),
                         dtype=np.float32, fillvalue=np.nan,
                         chunks=(1, spot_capacity, _SPOT_COLS))
        g.create_dataset("raw_spots",
                         shape=(n, spot_capacity, _SPOT_COLS),
                         dtype=np.float32, fillvalue=np.nan,
                         chunks=(1, spot_capacity, _SPOT_COLS))
        g.create_dataset("n_spots", data=np.zeros(n, np.int32))

    def data_types(self) -> List[str]:
        return [k for k in self._fh.keys()
                if k not in ("segmentation", "signal")]

    def region_index(self, data_type: str, region_id: int) -> int:
        ids = self._fh[data_type]["ids"][:]
        idx = np.where(ids == region_id)[0]
        if len(idx) == 0:
            raise KeyError(f"region {region_id} not in {data_type}")
        return int(idx[0])

    def transfer_data_type(self, data_type: str, target_type: str,
                           overwrite: bool = False) -> None:
        """Clone one data type's full group (ids/spots/flags/drifts/ims)
        under a new name — the store-side analog of the reference's
        attribute-renaming `_transfer_data_type` (classes/__init__.py:
        4329-4443, unique -> rna-unique), so downstream stages can
        re-pick/re-decode the copy without touching the original."""
        if data_type not in self._fh:
            raise KeyError(f"data type {data_type!r} not in store")
        if target_type in self._fh:
            if not overwrite:
                raise KeyError(f"target {target_type!r} exists; pass "
                               "overwrite=True to replace it")
            del self._fh[target_type]
        self._fh.copy(self._fh[data_type], target_type)

    # -- writes ----------------------------------------------------------

    def save_spots(self, data_type: str, region_id: int,
                   spots: np.ndarray, raw_spots: Optional[np.ndarray],
                   drift: np.ndarray, flag: int = FLAG_CORRECTED,
                   drift_flag: int = 0):
        g = self._fh[data_type]
        i = self.region_index(data_type, region_id)
        cap = g["spots"].shape[1]
        n = min(len(spots), cap)
        buf = np.full((cap, _SPOT_COLS), np.nan, np.float32)
        buf[:n] = np.asarray(spots[:n], np.float32)
        g["spots"][i] = buf
        if raw_spots is not None:
            rbuf = np.full((cap, _SPOT_COLS), np.nan, np.float32)
            rbuf[:n] = np.asarray(raw_spots[:n], np.float32)
            g["raw_spots"][i] = rbuf
        g["drifts"][i] = np.asarray(drift, np.float32)
        g["flags"][i] = flag
        if "drift_flags" in g:
            g["drift_flags"][i] = drift_flag
        g["n_spots"][i] = n

    # -- reads / resume --------------------------------------------------

    def flags(self, data_type: str) -> np.ndarray:
        return self._fh[data_type]["flags"][:]

    def drift_flags(self, data_type: str) -> np.ndarray:
        g = self._fh[data_type]
        if "drift_flags" in g:
            return g["drift_flags"][:]
        return np.zeros(len(g["ids"]), np.int32)

    def pending_regions(self, data_type: str,
                        required_flag: int = FLAG_CORRECTED) -> np.ndarray:
        """Region ids still needing processing (the resume check the
        reference does per-task, classes/field_of_view.py:1453-1522)."""
        g = self._fh[data_type]
        mask = g["flags"][:] < required_flag
        return g["ids"][:][mask]

    def load_spots(self, data_type: str, region_id: int
                   ) -> Tuple[np.ndarray, np.ndarray, int]:
        g = self._fh[data_type]
        i = self.region_index(data_type, region_id)
        n = int(g["n_spots"][i])
        return (g["spots"][i, :n], g["drifts"][i][:], int(g["flags"][i]))

    def load_all_spots(self, data_type: str) -> Dict[int, np.ndarray]:
        g = self._fh[data_type]
        out = {}
        for i, rid in enumerate(g["ids"][:]):
            n = int(g["n_spots"][i])
            if int(g["flags"][i]) > FLAG_EMPTY:
                out[int(rid)] = g["spots"][i, :n]
        return out

    # -- corrected images (optional heavy payload) -------------------------

    def save_image(self, data_type: str, region_id: int,
                   im: np.ndarray) -> None:
        """Persist one region's corrected image stack (reference
        save_image_to_fov_file `ims` dataset,
        classes/batch_functions.py:305-368).  The dataset is created
        lazily on first save so spot-only runs pay nothing."""
        g = self._fh[data_type]
        i = self.region_index(data_type, region_id)
        if "ims" not in g:
            n = len(g["ids"])
            g.create_dataset("ims", shape=(n,) + im.shape,
                             dtype=np.uint16,
                             chunks=(1,) + im.shape,
                             compression="gzip", compression_opts=1)
        g["ims"][i] = np.clip(np.asarray(im), 0, 65535).astype(np.uint16)

    def load_image(self, data_type: str, region_id: int) -> np.ndarray:
        g = self._fh[data_type]
        if "ims" not in g:
            raise KeyError(f"no images saved for {data_type}")
        return g["ims"][self.region_index(data_type, region_id)]

    def has_image(self, data_type: str, region_id: int) -> bool:
        g = self._fh[data_type]
        return "ims" in g and bool(
            np.any(g["ims"][self.region_index(data_type, region_id)]))

    # -- signal group (chromosome coordinates etc.) ------------------------

    def save_signal(self, name: str, data: np.ndarray, **attrs) -> None:
        """`signal` group datasets (reference chrom_coords / intensity
        thresholds, classes/field_of_view.py:1184-1245)."""
        g = self._fh.require_group("signal")
        if name in g:
            del g[name]
        d = g.create_dataset(name, data=np.asarray(data))
        for k, v in attrs.items():
            d.attrs[k] = v

    def load_signal(self, name: str):
        if "signal" not in self._fh or name not in self._fh["signal"]:
            return None
        return self._fh["signal"][name][:]

    # -- segmentation ----------------------------------------------------

    def save_segmentation(self, label_im: np.ndarray, **attrs):
        if "segmentation" in self._fh:
            del self._fh["segmentation"]
        g = self._fh.create_group("segmentation")
        g.create_dataset("labels", data=np.asarray(label_im),
                         compression="gzip", compression_opts=1)
        for k, v in attrs.items():
            g.attrs[k] = v

    def load_segmentation(self) -> Optional[np.ndarray]:
        if "segmentation" not in self._fh:
            return None
        return self._fh["segmentation"]["labels"][:]


class AsyncFovWriter:
    """Background-thread checkpoint writer over a :class:`FovStore`.

    The TPU-native stand-in for a tensorstore-style async writer
    (SURVEY §5: the reference serializes every worker's HDF5 access
    through one RLock, classes/field_of_view.py:1014-1020; here the
    single controller instead hands writes to one writer thread so the
    dispatch loop never blocks on storage).  h5py serializes HDF5 calls
    internally, so main-thread reads of rows the writer is not touching
    are safe; :meth:`barrier` gives read-after-write ordering when a
    row might still be queued.

    Write errors are captured and re-raised on the next submit /
    barrier / close — a checkpoint failure is never silent.
    """

    def __init__(self, store: FovStore, max_queue: int = 8):
        self._store = store
        self._q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="fov-store-writer")
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                fn, args, kwargs = item
                if self._exc is None:       # fail-stop after first error
                    fn(*args, **kwargs)
            except BaseException as e:      # noqa: BLE001 — re-raised later
                self._exc = e
            finally:
                self._q.task_done()

    def _raise_pending(self):
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise RuntimeError("async checkpoint write failed") from exc

    def submit(self, fn, *args, **kwargs) -> None:
        """Enqueue `fn(*args, **kwargs)` on the writer thread."""
        self._raise_pending()
        self._q.put((fn, args, kwargs))

    # the write surface the driver uses, mirrored 1:1 onto the store
    def save_spots(self, *args, **kwargs) -> None:
        self.submit(self._store.save_spots, *args, **kwargs)

    def save_image(self, *args, **kwargs) -> None:
        self.submit(self._store.save_image, *args, **kwargs)

    def save_signal(self, *args, **kwargs) -> None:
        self.submit(self._store.save_signal, *args, **kwargs)

    def save_segmentation(self, *args, **kwargs) -> None:
        self.submit(self._store.save_segmentation, *args, **kwargs)

    def flush(self) -> None:
        self.submit(self._store.flush)

    def barrier(self) -> None:
        """Block until every queued write has executed."""
        self._q.join()
        self._raise_pending()

    def close(self) -> None:
        """Drain the queue and stop the writer thread (store stays open)."""
        self._q.join()
        self._q.put(None)
        self._thread.join()
        self._raise_pending()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
