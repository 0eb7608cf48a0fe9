"""Zhuang-lab .dax movie format: reader, writer, channel de-interleave.

Behavior targets (reference ImageAnalysis3):
  * .inf parsing + movie load   visual_tools.py:974-1083 (DaxReader)
  * .dax writing                io_tools/data.py:117-160 (DaxWriter)
  * frame/color accounting      io_tools/load.py:17-45 (get_num_frame)
  * channel de-interleave       io_tools/load.py:524-550 (split_im_by_channels)

Format: raw uint16 frames (frames, width, height), optionally big-endian,
with a text `.inf` sidecar carrying dimensions/frame-count/endianness and
stage metadata.  Channels are interleaved frame-by-frame after
`num_buffer_frames` warm-up frames (and again before trailing buffer
frames): frame index f belongs to channel (f - buffer - empty) mod C.

Host-side NumPy; `read_dax(memmap=True)` returns a zero-copy view so the
de-interleave slices feed the device without a full host copy.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np


@dataclass
class DaxMetadata:
    """Parsed .inf sidecar."""

    number_frames: int
    image_width: int       # second .inf dimension (columns)
    image_height: int      # first .inf dimension (rows)
    big_endian: bool = False
    stage_x: Optional[float] = None
    stage_y: Optional[float] = None
    lock_target: Optional[float] = None
    scale_min: Optional[int] = None
    scale_max: Optional[int] = None
    extras: dict = field(default_factory=dict)

    @property
    def frame_shape(self) -> Tuple[int, int]:
        return (self.image_height, self.image_width)

    def to_inf_text(self) -> str:
        # the canonical sidecar spells endianness as "(binary, big endian)";
        # the reference regex requires the space before big|little
        # (visual_tools.py:994)
        endian = "big endian" if self.big_endian else "little endian"
        lines = [
            f"binary types = 16 bit integers (binary, {endian})",
            f"frame dimensions = {self.image_height} x {self.image_width}",
            f"number of frames = {self.number_frames}",
            f"data type = 16 bit integers (binary, {endian})",
        ]
        if self.stage_x is not None:
            lines.append(f"Stage X = {self.stage_x}")
        if self.stage_y is not None:
            lines.append(f"Stage Y = {self.stage_y}")
        if self.lock_target is not None:
            lines.append(f"Lock Target = {self.lock_target}")
        if self.scale_max is not None:
            lines.append(f"scalemax = {self.scale_max}")
        if self.scale_min is not None:
            lines.append(f"scalemin = {self.scale_min}")
        return "\n".join(lines) + "\n"


# whitespace-tolerant: real Hal-generated sidecars vary the spacing around
# '=' and 'x', which the reference's exact-match regexes silently miss
_SIZE_RE = re.compile(r"frame dimensions\s*=\s*(\d+)\s*x\s*(\d+)")
_LEN_RE = re.compile(r"number of frames\s*=\s*(\d+)")
_ENDIAN_RE = re.compile(r"\s(big|little)\s+endian")
_STAGEX_RE = re.compile(r"Stage X\s*=\s*([\d.\-]+)")
_STAGEY_RE = re.compile(r"Stage Y\s*=\s*([\d.\-]+)")
_LOCK_RE = re.compile(r"Lock Target\s*=\s*([\d.\-]+)")
_SMAX_RE = re.compile(r"scalemax\s*=\s*([\d.\-]+)")
_SMIN_RE = re.compile(r"scalemin\s*=\s*([\d.\-]+)")


def inf_path_of(dax_filename: str) -> str:
    base, _ = os.path.splitext(dax_filename)
    return base + ".inf"


def read_inf(path: str) -> DaxMetadata:
    """Parse a .inf sidecar (accepts the .dax path too).

    Regex semantics match reference visual_tools.py:992-1032.
    """
    if path.endswith(".dax"):
        path = inf_path_of(path)
    meta = DaxMetadata(number_frames=0, image_width=256, image_height=256)
    with open(path, "r") as fh:
        for line in fh:
            m = _SIZE_RE.match(line)
            if m:
                meta.image_height = int(m.group(1))
                meta.image_width = int(m.group(2))
            m = _LEN_RE.match(line)
            if m:
                meta.number_frames = int(m.group(1))
            m = _ENDIAN_RE.search(line)
            if m:
                meta.big_endian = m.group(1) == "big"
            for regex, attr, cast in ((_STAGEX_RE, "stage_x", float),
                                      (_STAGEY_RE, "stage_y", float),
                                      (_LOCK_RE, "lock_target", float),
                                      (_SMAX_RE, "scale_max", int),
                                      (_SMIN_RE, "scale_min", int)):
                m = regex.match(line)
                if m:
                    setattr(meta, attr, cast(m.group(1)))
    if meta.number_frames == 0:
        raise ValueError(f"no 'number of frames' entry parsed from {path}")
    return meta


def read_dax(filename: str, meta: Optional[DaxMetadata] = None,
             memmap: bool = True,
             out: Optional[np.ndarray] = None
             ) -> Tuple[np.ndarray, DaxMetadata]:
    """Load a .dax movie -> ((frames, H, W) uint16 array-or-memmap, meta).

    ``out``: preallocated (frames, H, W) uint16 buffer read into in place
    (implies memmap=False).  Reusing a staging buffer across FOVs is the
    production input-pipeline pattern (pinned host staging for device
    upload) and avoids per-read allocation entirely.
    """
    if meta is None:
        meta = read_inf(filename)
    dtype = ">u2" if meta.big_endian else "<u2"
    shape = (meta.number_frames,) + meta.frame_shape
    if out is not None:
        if out.shape != shape or out.dtype.itemsize != 2:
            raise ValueError(f"out buffer {out.shape}/{out.dtype} does not "
                             f"match movie {shape} uint16")
        with open(filename, "rb") as fh:
            n = fh.readinto(memoryview(out).cast("B"))
        if n != out.nbytes:
            raise ValueError(f"short read: {n} of {out.nbytes} bytes "
                             f"from {filename}")
        return out.view(dtype).reshape(shape), meta
    if memmap:
        data = np.memmap(filename, dtype=dtype, mode="r", shape=shape)
    else:
        data = np.fromfile(filename, dtype=dtype).reshape(shape)
    return data, meta


def write_dax(filename: str, movie: np.ndarray,
              big_endian: bool = False, **meta_kwargs) -> DaxMetadata:
    """Write (frames, H, W) uint16 movie + its .inf sidecar.

    Behavior target: io_tools/data.py:117-160 (DaxWriter).
    """
    movie = np.asarray(movie)
    if movie.ndim != 3:
        raise ValueError(f"movie must be (frames, H, W), got {movie.shape}")
    # copy=False: a movie already in the target byte order streams to
    # disk without materializing a second multi-GB host buffer
    out = movie.astype(">u2" if big_endian else "<u2", copy=False)
    out.tofile(filename)
    meta = DaxMetadata(number_frames=movie.shape[0],
                       image_height=movie.shape[1],
                       image_width=movie.shape[2],
                       big_endian=big_endian, **meta_kwargs)
    with open(inf_path_of(filename), "w") as fh:
        fh.write(meta.to_inf_text())
    return meta


def get_num_frames_and_colors(dax_filename: str, frame_per_color: int = 30,
                              buffer_frames: int = 10,
                              empty_frames: int = 0
                              ) -> Tuple[Tuple[int, int, int], int]:
    """((frames, H, W), n_colors) from the .inf accounting
    (reference io_tools/load.py:17-45)."""
    meta = read_inf(dax_filename)
    usable = meta.number_frames - 2 * buffer_frames - empty_frames
    n_color = usable / frame_per_color
    if n_color != int(n_color):
        raise ValueError(
            f"frame count {meta.number_frames} does not decompose into "
            f"{frame_per_color} frames/color with {buffer_frames} buffer + "
            f"{empty_frames} empty frames")
    return (meta.number_frames, *meta.frame_shape), int(n_color)


def channel_start_frames(sel_channels, all_channels,
                         buffer_frames: int = 10, empty_frames: int = 0,
                         skip_frame0: bool = False
                         ) -> Tuple[List[int], int]:
    """(per-selected-channel first frame index, n_colors) for the
    interleaved frame layout (reference io_tools/load.py:524-550 start
    arithmetic, shared by :func:`split_channels` and the native fused
    loader)."""
    all_ch = [str(c) for c in all_channels]
    sel_ch = [str(c) for c in ([sel_channels] if isinstance(
        sel_channels, (str, int)) else sel_channels)]
    n_colors = len(all_ch)
    for ch in sel_ch:
        if ch not in all_ch:
            raise ValueError(f"channel {ch} not in {all_ch}")
    starts = []
    for ch in sel_ch:
        i = all_ch.index(ch)
        s = (empty_frames + buffer_frames
             + (i - empty_frames - buffer_frames) % n_colors)
        if skip_frame0 and s == buffer_frames:
            s += n_colors
        starts.append(s)
    return starts, n_colors


def split_channels(movie: np.ndarray,
                   sel_channels: Sequence[Union[str, int]],
                   all_channels: Sequence[Union[str, int]],
                   n_z: int = 30,
                   buffer_frames: int = 10,
                   empty_frames: int = 0,
                   skip_frame0: bool = False,
                   out: Optional[List[np.ndarray]] = None
                   ) -> List[np.ndarray]:
    """De-interleave selected channels out of a raw movie.

    Channel at index i starts at frame buffer+empty + (i - buffer - empty)
    mod C and strides by C for n_z frames (reference io_tools/load.py:
    524-550, including its start-offset arithmetic and skip_frame0).

    ``out``: optional list of preallocated (n_z, H, W) per-channel buffers
    copied into in place (staging-buffer reuse, see :func:`read_dax`).
    """
    starts, n_colors = channel_start_frames(
        sel_channels, all_channels, buffer_frames=buffer_frames,
        empty_frames=empty_frames, skip_frame0=skip_frame0)
    if out is not None:
        if len(out) != len(starts):
            raise ValueError(f"out has {len(out)} buffers for "
                             f"{len(starts)} channels")
        for buf, s in zip(out, starts):
            np.copyto(buf, movie[s:s + n_z * n_colors:n_colors])
        return list(out)
    return [np.ascontiguousarray(movie[s:s + n_z * n_colors:n_colors])
            for s in starts]


@dataclass(frozen=True)
class RawFrameWindow:
    """Layout of the contiguous raw-frame window one round needs.

    The device-deinterleave input mode (SURVEY §7 host-I/O gate): the
    host does ONE sequential pread of frames [first_frame,
    first_frame + n_frames) — skipping leading/trailing buffer frames —
    and the per-channel de-interleave happens on device as strided
    slices at ``rel_starts`` with stride ``n_colors``
    (ops.corrections.deinterleave_stack).  Host work collapses to a raw
    read; reference semantics io_tools/load.py:524-550 are preserved by
    construction (same start arithmetic as :func:`channel_start_frames`).

    Note: the window spans ALL interleaved colors between the first and
    last needed frame, so with a strict channel subset it reads more
    bytes than the selective native loader — the tradeoff is zero host
    de-interleave CPU and a purely sequential read.
    """

    first_frame: int
    n_frames: int
    rel_starts: Tuple[int, ...]   # per-selected-channel start, window-relative
    n_colors: int
    n_z: int


def raw_frame_window(sel_channels, all_channels, n_z: int = 30,
                     buffer_frames: int = 10, empty_frames: int = 0,
                     skip_frame0: bool = False) -> RawFrameWindow:
    """Compute the contiguous frame window covering every selected
    channel's ``n_z`` interleaved frames (static metadata for the
    device-deinterleave program; see :class:`RawFrameWindow`)."""
    starts, n_colors = channel_start_frames(
        sel_channels, all_channels, buffer_frames=buffer_frames,
        empty_frames=empty_frames, skip_frame0=skip_frame0)
    lo = min(starts)
    hi = max(s + (n_z - 1) * n_colors for s in starts) + 1
    return RawFrameWindow(first_frame=lo, n_frames=hi - lo,
                          rel_starts=tuple(s - lo for s in starts),
                          n_colors=n_colors, n_z=n_z)


def read_raw_window(filename: str, window: RawFrameWindow,
                    meta: Optional[DaxMetadata] = None,
                    out: Optional[np.ndarray] = None) -> np.ndarray:
    """One sequential pread of ``window``'s frames -> (F, H, W) uint16.

    The host floor of the input pipeline: no de-interleave, no per-frame
    scatter — a single ``readinto`` at a file offset into a reusable
    staging buffer.  Device code de-interleaves
    (ops.corrections.deinterleave_stack).  Big-endian movies are
    byteswapped in place on the host (rare; production cameras write
    little-endian)."""
    if meta is None:
        meta = read_inf(filename)
    h, w = meta.frame_shape
    shape = (window.n_frames, h, w)
    need = window.first_frame + window.n_frames
    if need > meta.number_frames:
        raise ValueError(f"movie has {meta.number_frames} frames; "
                         f"window needs {need}")
    if out is None:
        out = np.empty(shape, np.uint16)
    elif out.shape != shape or out.dtype != np.uint16 \
            or not out.flags.c_contiguous:
        raise ValueError(f"out buffer {out.shape}/{out.dtype} does not "
                         f"match C-contiguous {shape} uint16")
    frame_bytes = h * w * 2
    with open(filename, "rb") as fh:
        fh.seek(window.first_frame * frame_bytes)
        n = fh.readinto(memoryview(out).cast("B"))
    if n != out.nbytes:
        raise ValueError(f"short read: {n} of {out.nbytes} bytes "
                         f"from {filename}")
    if meta.big_endian:
        out.byteswap(inplace=True)
    return out


def read_dax_window(filename: str,
                    zlims: Sequence[int],
                    xlims: Optional[Sequence[int]] = None,
                    ylims: Optional[Sequence[int]] = None,
                    zstep: int = 1,
                    zstarts: Union[int, Sequence[int]] = 0,
                    meta: Optional[DaxMetadata] = None
                    ) -> List[np.ndarray]:
    """Read only a (frames, rows, cols) window of a .dax movie from disk.

    Behavior target: visual_tools.py:2073-2183 (slice_image) — the
    memory-efficient partial read behind the reference's per-cell crop
    loaders.  ``zlims`` select raw frame indices [z0, z1); within that
    range one sub-stack is gathered per ``zstarts`` entry at stride
    ``zstep`` (the interleaved-channel layout: zstep = n_colors, zstart =
    channel id).  The read goes through a memmap so only the touched
    pages — the selected frames' row window — are ever paged in; a
    2048x2048 x 60-frame movie yields a 64^3 crop with ~0.4% of the file
    read.

    Returns one (dz, dx, dy) contiguous uint16 array per zstart.
    """
    if zstep <= 0:
        raise ValueError(f"zstep must be positive, got {zstep}")
    starts = [zstarts] if isinstance(zstarts, (int, np.integer)) else list(zstarts)
    for s in starts:
        if s < 0 or s >= zstep:
            raise ValueError(f"zstart {s} outside [0, {zstep})")
    movie, meta = read_dax(filename, meta=meta, memmap=True)
    z0, z1 = sorted(int(v) for v in zlims)
    x0, x1 = sorted(int(v) for v in xlims) if xlims is not None \
        else (0, meta.image_height)
    y0, y1 = sorted(int(v) for v in ylims) if ylims is not None \
        else (0, meta.image_width)
    z0 = max(z0, 0)
    z1 = min(z1, meta.number_frames)
    out = []
    for s in starts:
        first = z0 + (s - z0) % zstep
        out.append(np.ascontiguousarray(movie[first:z1:zstep, x0:x1, y0:y1]))
    return out


def _normalize_crop_limits(crop_limits, single_im_size) -> np.ndarray:
    """(2|3)x2 crop limits -> full 3x2 int array with negative-upper
    wraparound (reference visual_tools.py:2550-2566)."""
    size = np.asarray(single_im_size, dtype=np.int64)
    if crop_limits is None:
        lims = np.stack([np.zeros(3, np.int64), size], axis=1)
    else:
        lims = np.asarray(crop_limits, dtype=np.int64)
        if lims.shape == (2, 2):
            lims = np.concatenate([np.array([[0, size[0]]]), lims], axis=0)
        elif lims.shape != (3, 2):
            raise ValueError(f"crop_limits must be 2x2 or 3x2, "
                             f"got {np.shape(crop_limits)}")
        lims = lims.copy()
        for ax in range(3):
            if lims[ax, 1] < 0:
                lims[ax, 1] += size[ax]
    return lims


def read_channel_crops(filename: str,
                       sel_channels: Sequence[Union[str, int]],
                       crop_limits=None,
                       *,
                       all_channels: Sequence[Union[str, int]],
                       n_z: int = 30,
                       buffer_frames: int = 10,
                       empty_frames: int = 0,
                       skip_frame0: bool = False,
                       drift: Optional[Sequence[float]] = None,
                       return_limits: bool = False,
                       meta: Optional[DaxMetadata] = None
                       ) -> Union[List[np.ndarray],
                                  Tuple[List[np.ndarray], np.ndarray]]:
    """Drift-aware cropped channel load straight from disk.

    Behavior target: visual_tools.py:2514-2612
    (crop_multi_channel_image_v2), the reference's production per-cell
    disk loader: expand the requested window by ceil(|drift|) per axis,
    read ONLY that window (:func:`read_dax_window`), then resample the
    small crop onto the drift-corrected grid — so a whole-FOV load and
    warp never happens.  The resample runs on device through
    ``ops.warp.trilinear_map_coordinates`` (the same kernel the full-FOV
    correction path uses), replacing the reference's host
    ``scipy.ndimage.map_coordinates`` call.

    ``crop_limits``: 2x2 (x/y, full z) or 3x2 (z/x/y) in per-channel
    pixel coordinates; negative upper limits wrap (numpy-slice style).
    ``drift``: (dz, dx, dy) in THIS repo's convention — the value
    ``align_image`` returns and the FOV store persists, under which the
    full-FOV path corrects via ``corrected(x) = im(x - drift)``
    (ops/warp.py warp_image_drift); store drifts feed here directly.
    (The reference's crop loader uses the opposite sign.)

    Returns one (dz, dx, dy) float32 (drift) or uint16 (no drift) crop
    per selected channel; with ``return_limits``, also the 3x2 limits the
    crops cover in the corrected frame.
    """
    if meta is None:
        meta = read_inf(filename)
    starts, n_colors = channel_start_frames(
        sel_channels, all_channels, buffer_frames=buffer_frames,
        empty_frames=empty_frames, skip_frame0=skip_frame0)
    single_im_size = (n_z, meta.image_height, meta.image_width)
    lims = _normalize_crop_limits(crop_limits, single_im_size)
    d = np.zeros(3) if drift is None else np.asarray(drift, dtype=np.float64)
    if d.shape != (3,):
        raise ValueError(f"drift must have 3 entries, got {d.shape}")
    # expand by the drift magnitude so the shifted window stays inside
    # the read (clamped at image borders, like the reference)
    pad = np.ceil(np.abs(d)).astype(np.int64)
    read_lims = np.stack([np.maximum(lims[:, 0] - pad, 0),
                          np.minimum(lims[:, 1] + pad, single_im_size)],
                         axis=1)
    crops = []
    for s in starts:
        zlims = (s + read_lims[0, 0] * n_colors,
                 s + read_lims[0, 1] * n_colors)
        (crop,) = read_dax_window(
            filename, zlims, read_lims[1], read_lims[2],
            zstep=n_colors, zstarts=s % n_colors, meta=meta)
        crops.append(crop)
    if d.any():
        # output voxel (z,x,y) in corrected-frame coords lims[:,0]+idx
        # samples the raw image at -drift (repo convention, see above),
        # expressed in read-window coords
        offs = lims[:, 0] - read_lims[:, 0] - d
        shape = tuple(int(lims[ax, 1] - lims[ax, 0]) for ax in range(3))
        crops = [resample_window(c, offs, shape) for c in crops]
    if return_limits:
        return crops, lims
    return crops


def resample_window(crop: np.ndarray, start_offsets: Sequence[float],
                    out_shape: Sequence[int]) -> np.ndarray:
    """Trilinear-resample a window: output voxel ``idx`` samples ``crop``
    at ``idx + start_offsets`` (edge-clamped), on device.  The shift step
    shared by :func:`read_channel_crops` and the driver's disk-crop
    loader."""
    from ..ops.warp import trilinear_map_coordinates
    import jax.numpy as jnp
    axes = [jnp.arange(int(n), dtype=jnp.float32) + jnp.float32(o)
            for n, o in zip(out_shape, start_offsets)]
    zz, xx, yy = jnp.meshgrid(*axes, indexing="ij")
    return np.asarray(trilinear_map_coordinates(
        jnp.asarray(crop, jnp.float32), jnp.stack([zz, xx, yy])))


def remove_dax_channels(source_filename: str,
                        target_filename: str,
                        keep_channels: Sequence[Union[str, int]],
                        all_channels: Sequence[Union[str, int]],
                        n_z: int = 30,
                        buffer_frames: int = 10,
                        empty_frames: int = 0,
                        overwrite: bool = False) -> List[str]:
    """Rewrite a .dax keeping only ``keep_channels`` (in that order).

    Behavior target: visual_tools.py:3165-3255 (Remove_Dax_Channel +
    shuffle_channel_order): drop the frames of unwanted channels,
    reorder the kept ones to the requested order, preserve the
    warm-up/trailing buffer frames, and write a fresh .inf.  Reads go
    through the movie memmap so only kept frames are paged in.

    Returns the kept channel names actually written.
    """
    if os.path.isfile(target_filename) and not overwrite:
        raise FileExistsError(f"{target_filename} exists (overwrite=False)")
    src = [str(c) for c in all_channels]
    kept = [str(c) for c in keep_channels if str(c) in src]
    if not kept:
        raise ValueError(f"no channel of {keep_channels} present in {src}")
    movie, _ = read_dax(source_filename, memmap=True)
    stacks = split_channels(movie, kept, src, n_z=n_z,
                            buffer_frames=buffer_frames,
                            empty_frames=empty_frames)
    out = interleave_channels(stacks, buffer_frames=buffer_frames,
                              empty_frames=empty_frames)
    write_dax(target_filename, out)
    return kept


def interleave_channels(stacks: Sequence[np.ndarray],
                        buffer_frames: int = 10,
                        empty_frames: int = 0) -> np.ndarray:
    """Inverse of :func:`split_channels`: per-channel (Z, H, W) stacks ->
    one interleaved movie with warm-up/trailing buffer frames.

    Frame ``buffer + k`` carries channel ``(k + buffer) % C`` so that the
    reference's start-offset arithmetic (io_tools/load.py:538-540)
    de-interleaves it back exactly; buffer frames repeat the first/last
    frames.  Used by the synthetic-experiment factory and round-trip tests.
    """
    stacks = [np.asarray(s) for s in stacks]
    c = len(stacks)
    n_z = stacks[0].shape[0]
    frame_shape = stacks[0].shape[1:]
    total = empty_frames + buffer_frames + n_z * c + buffer_frames
    movie = np.zeros((total,) + frame_shape, dtype=stacks[0].dtype)
    base = empty_frames + buffer_frames
    for k in range(n_z * c):
        ch = (k + base) % c
        z = k // c
        movie[base + k] = stacks[ch][z]
    movie[:base] = movie[base]
    movie[base + n_z * c:] = movie[base + n_z * c - 1]
    return movie
