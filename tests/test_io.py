"""Dax I/O round-trips and channel de-interleave vs reference arithmetic."""

import os

import numpy as np
import pytest

from imageanalysis3_tpu.io import (DaxMetadata, read_inf, read_dax, write_dax,
                                   split_channels, get_num_frames_and_colors,
                                   load_color_usage, find_hyb_folders)


@pytest.mark.parametrize("big_endian", [False, True])
def test_dax_roundtrip(tmp_path, rng, big_endian):
    movie = rng.integers(0, 65535, size=(7, 32, 48)).astype(np.uint16)
    path = str(tmp_path / "conv_zscan_00.dax")
    write_dax(path, movie, big_endian=big_endian, stage_x=123.5,
              stage_y=-7.25)
    back, meta = read_dax(path)
    np.testing.assert_array_equal(np.asarray(back), movie)
    assert meta.number_frames == 7
    assert meta.frame_shape == (32, 48)
    assert meta.big_endian == big_endian
    assert meta.stage_x == 123.5 and meta.stage_y == -7.25
    # non-memmap path too
    back2, _ = read_dax(path, memmap=False)
    np.testing.assert_array_equal(back2, movie)


def test_read_dax_and_split_into_staging_buffers(tmp_path, rng):
    """read_dax(out=) / split_channels(out=) must fill preallocated
    staging buffers with exactly what the allocating paths return (the
    buffer-pool pattern the input pipeline and bench_io use)."""
    n_z, buffer = 5, 2
    all_ch = ["750", "647", "561"]
    frames = n_z * 3 + 2 * buffer
    movie = rng.integers(0, 65535, size=(frames, 16, 16)).astype(np.uint16)
    path = str(tmp_path / "fov.dax")
    write_dax(path, movie)

    buf = np.empty(movie.shape, np.uint16)
    back, _ = read_dax(path, out=buf)
    np.testing.assert_array_equal(back, movie)
    assert back.base is buf or back is buf

    outs = [np.empty((n_z, 16, 16), np.uint16) for _ in all_ch]
    got = split_channels(back, all_ch, all_ch, n_z=n_z,
                         buffer_frames=buffer, out=outs)
    ref = split_channels(movie, all_ch, all_ch, n_z=n_z,
                         buffer_frames=buffer)
    for a, b, o in zip(got, ref, outs):
        assert a is o
        np.testing.assert_array_equal(a, b)

    with pytest.raises(ValueError):
        read_dax(path, out=np.empty((frames, 16, 15), np.uint16))
    with pytest.raises(ValueError):
        split_channels(back, all_ch, all_ch, n_z=n_z,
                       buffer_frames=buffer, out=outs[:2])


@pytest.mark.parametrize("big_endian", [False, True])
def test_raw_window_pread_and_device_deinterleave(tmp_path, rng,
                                                  big_endian):
    """Raw-pread input mode parity: one sequential read of the frame
    window + on-device strided de-interleave must equal read_dax +
    split_channels exactly (reference layout arithmetic
    io_tools/load.py:524-550), including a strict channel subset and a
    big-endian movie."""
    import jax.numpy as jnp

    from imageanalysis3_tpu.io.dax import raw_frame_window, read_raw_window
    from imageanalysis3_tpu.ops.corrections import deinterleave_stack

    n_z, buffer = 5, 3
    all_ch = ["750", "647", "561", "488"]
    sel = ["647", "488"]
    frames = n_z * len(all_ch) + 2 * buffer
    movie = rng.integers(0, 65535, size=(frames, 16, 16)).astype(np.uint16)
    path = str(tmp_path / "fov.dax")
    write_dax(path, movie, big_endian=big_endian)

    from imageanalysis3_tpu.io.dax import channel_start_frames
    win = raw_frame_window(sel, all_ch, n_z=n_z, buffer_frames=buffer)
    # the window skips the leading buffer frames entirely and starts at
    # the earliest selected channel's first frame
    starts, _ = channel_start_frames(sel, all_ch, buffer_frames=buffer)
    assert win.first_frame == min(starts) >= buffer
    raw = read_raw_window(path, win)
    assert raw.shape == (win.n_frames, 16, 16)
    # staging-buffer reuse path
    buf = np.empty_like(raw)
    raw2 = read_raw_window(path, win, out=buf)
    assert raw2 is buf
    np.testing.assert_array_equal(raw, raw2)

    got = np.asarray(deinterleave_stack(jnp.asarray(raw), win.rel_starts,
                                        win.n_colors, win.n_z))
    ref = split_channels(movie, sel, all_ch, n_z=n_z,
                         buffer_frames=buffer)
    np.testing.assert_array_equal(got, np.stack(ref))

    with pytest.raises(ValueError):
        read_raw_window(path, win, out=np.empty((1, 16, 16), np.uint16))


def test_frame_accounting(tmp_path, rng):
    n_z, n_colors, buffer = 6, 3, 4
    frames = n_z * n_colors + 2 * buffer
    movie = rng.integers(0, 65535, size=(frames, 16, 16)).astype(np.uint16)
    path = str(tmp_path / "fov.dax")
    write_dax(path, movie)
    shape, colors = get_num_frames_and_colors(path, frame_per_color=n_z,
                                              buffer_frames=buffer)
    assert shape == (frames, 16, 16)
    assert colors == n_colors
    with pytest.raises(ValueError):
        get_num_frames_and_colors(path, frame_per_color=5,
                                  buffer_frames=buffer)


def test_split_channels_reference_arithmetic(rng):
    """The de-interleave must reproduce the reference start-frame formula
    (io_tools/load.py:538-540) including buffer-frame phase wrap."""
    n_z, buffer = 5, 10
    all_ch = ["750", "647", "561"]
    frames = n_z * 3 + 2 * buffer
    # encode (channel, z) into pixel values for exact provenance
    movie = np.zeros((frames, 4, 4), np.uint16)
    for f in range(frames):
        movie[f] = f
    ims = split_channels(movie, all_ch, all_ch, n_z=n_z,
                         buffer_frames=buffer)
    for i, im in enumerate(ims):
        start = buffer + (i - buffer) % 3
        expect = np.arange(start, start + n_z * 3, 3)
        np.testing.assert_array_equal(im[:, 0, 0], expect)
    # skip_frame0 moves a channel that starts exactly at the buffer edge
    ims2 = split_channels(movie, ["750"], all_ch, n_z=n_z - 1,
                          buffer_frames=buffer, skip_frame0=True)
    start0 = buffer + (0 - buffer) % 3
    if start0 == buffer:
        start0 += 3
    np.testing.assert_array_equal(ims2[0][:, 0, 0],
                                  np.arange(start0, start0 + (n_z - 1) * 3, 3))


def test_color_usage_and_folders(tmp_path):
    cu_text = ("Hyb,750,647,561,488,405\n"
               "H0R0,u1,u2,beads,,DAPI\n"
               "H1R1,u3,u4,beads,,\n"
               "H2R2,c1,c2,beads,,\n")
    (tmp_path / "Color_Usage.csv").write_text(cu_text)
    cu = load_color_usage(str(tmp_path))
    assert cu.channels == ["750", "647", "561", "488", "405"]
    assert cu.has_dapi
    assert cu.bead_channel_index() == 2
    assert cu.dapi_channel_index() == 4
    assert cu.regions_of("H1R1") == {0: "u3", 1: "u4"}
    assert list(cu.usage) == ["H0R0", "H1R1", "H2R2"]

    # folder scan: H-prefixed dirs with dax files, numeric ordering
    for name in ["H0R0", "H2R2", "H10R10", "H1R1", "Analysis"]:
        d = tmp_path / name
        d.mkdir()
        if name != "Analysis":
            write_dax(str(d / "Conv_zscan_01.dax"),
                      np.zeros((2, 4, 4), np.uint16))
            write_dax(str(d / "Conv_zscan_00.dax"),
                      np.zeros((2, 4, 4), np.uint16))
    folders, fovs = find_hyb_folders(str(tmp_path))
    names = [os.path.basename(f) for f in folders]
    assert names == ["H0R0", "H1R1", "H2R2", "H10R10"]
    assert fovs == ["Conv_zscan_00.dax", "Conv_zscan_01.dax"]


def test_store_images_and_signal(tmp_path):
    """Optional `ims` payload + `signal` group (reference
    classes/batch_functions.py:305-368, field_of_view.py:1184-1245)."""
    import numpy as np
    from imageanalysis3_tpu.io.store import FovStore

    path = str(tmp_path / "imstore.hdf5")
    rng = np.random.default_rng(0)
    im = rng.integers(0, 5000, size=(4, 16, 16)).astype(np.uint16)
    with FovStore(path) as store:
        store.init_data_type("unique", [1, 2], ["750", "647"],
                             spot_capacity=8)
        assert not store.has_image("unique", 1)
        store.save_image("unique", 1, im)
        assert store.has_image("unique", 1)
        np.testing.assert_array_equal(store.load_image("unique", 1), im)
        store.save_signal("chrom_coords", np.array([[1.0, 2, 3]]),
                          threshold=5.0)
    with FovStore(path, "r") as store:
        np.testing.assert_array_equal(store.load_signal("chrom_coords"),
                                      [[1.0, 2, 3]])
        assert store.load_signal("missing") is None
        assert store.data_types() == ["unique"]


def test_correction_profile_naming_roundtrip(tmp_path):
    """Profile files follow the reference naming conventions exactly
    (io_tools/load.py:553-640), so correction folders interchange."""
    import numpy as np
    from imageanalysis3_tpu.io.profiles_io import (load_correction_profile,
                                                   save_correction_profile)

    rng = np.random.default_rng(0)
    folder = str(tmp_path / "Corrections")
    im_size = (8, 32, 32)
    chs = ("750", "647", "561")

    illum = {c: rng.uniform(0.5, 1.0, im_size[1:]).astype(np.float32)
             for c in chs}
    save_correction_profile("illumination", illum, folder, chs,
                            im_size=im_size)
    import os
    assert os.path.exists(os.path.join(
        folder, "illumination_correction_750_32x32.npy"))
    back = load_correction_profile("illumination", folder, chs,
                                   im_size=im_size)
    np.testing.assert_allclose(back["647"], illum["647"])

    bleed = rng.normal(size=(3, 3) + im_size[1:]).astype(np.float32)
    save_correction_profile("bleedthrough", bleed, folder, chs,
                            im_size=im_size)
    assert os.path.exists(os.path.join(
        folder, "bleedthrough_correction_750_647_561_32_32.npy"))
    back_b = load_correction_profile("bleedthrough", folder, chs,
                                     im_size=im_size)
    np.testing.assert_allclose(back_b, bleed)

    consts = {c: rng.normal(size=(3, 10)).astype(np.float32)
              for c in ("750", "561")}
    consts["647"] = None
    save_correction_profile("chromatic_constants", consts, folder, chs,
                            im_size=im_size)
    assert os.path.exists(os.path.join(
        folder, "chromatic_correction_750_647_8_32_32_const.pkl"))
    back_c = load_correction_profile("chromatic_constants", folder, chs,
                                     im_size=im_size)
    np.testing.assert_allclose(back_c["750"], consts["750"])
    assert back_c["647"] is None


def test_async_writer_parity_barrier_and_error(tmp_path, rng):
    """AsyncFovWriter: queued writes land identically to direct writes,
    barrier() gives read-after-write, and a failed write re-raises at
    close instead of vanishing."""
    from imageanalysis3_tpu.io.store import (FovStore, AsyncFovWriter,
                                             FLAG_CORRECTED)

    spots = rng.normal(size=(5, 11)).astype(np.float32)
    drift = np.array([1.0, -2.0, 0.5], np.float32)

    with FovStore(str(tmp_path / "sync.h5")) as s:
        s.init_data_type("unique", [1, 2], ["750", "647"], spot_capacity=8)
        s.save_spots("unique", 2, spots, spots, drift,
                     flag=FLAG_CORRECTED, drift_flag=1)
        want = s._fh["unique"]["spots"][:]

    with FovStore(str(tmp_path / "async.h5")) as s:
        s.init_data_type("unique", [1, 2], ["750", "647"], spot_capacity=8)
        w = AsyncFovWriter(s)
        w.save_spots("unique", 2, spots, spots, drift,
                     flag=FLAG_CORRECTED, drift_flag=1)
        w.flush()
        w.barrier()                     # read-after-write ordering
        got_spots, got_drift, flag = s.load_spots("unique", 2)
        np.testing.assert_array_equal(got_spots, spots)
        np.testing.assert_array_equal(got_drift, drift)
        assert flag == FLAG_CORRECTED
        w.close()
        np.testing.assert_array_equal(s._fh["unique"]["spots"][:], want)

    with FovStore(str(tmp_path / "err.h5")) as s:
        s.init_data_type("unique", [1], ["750"], spot_capacity=8)
        w = AsyncFovWriter(s)
        w.save_spots("unique", 99, spots, None, drift)   # unknown region
        with pytest.raises(RuntimeError, match="async checkpoint"):
            w.close()


def test_metadata_long_tail_loaders_and_matchers(tmp_path):
    """RNA/Gene/ChIP loaders + genomic matchers (reference
    get_img_info.py:230-493) and the uniqueness-checked channel
    detection (get_img_info.py:496-524)."""
    from imageanalysis3_tpu.io.color_usage import (
        ColorUsage, load_rna_info, load_gene_info, load_chip_data,
        match_peaks_to_regions, match_rna_to_dna, match_gene_to_dna,
        match_enhancers_to_dna)

    (tmp_path / "RNA_Info.csv").write_text(
        "RNA_id,gene_name,chr,strand,start,end,midpoint\n"
        "r13,CYP4F29P,chr21,-,13848364,13843133,13845748.5\n"
        "r14,OTHER,chr21,+,20000100,20000900,20000500.0,\n")
    rna = load_rna_info(str(tmp_path))
    assert rna["r13"]["start"] == 13848364
    assert rna["r14"]["midpoint"] == 20000500.0

    (tmp_path / "Gene_Info.csv").write_text(
        "gene_id,gene_name,chr,strand,TSS_position,readout\n"
        "2,HSPA13,chr21,-,14383484,NDB_1159\n")
    genes = load_gene_info(str(tmp_path))
    assert genes[2]["TSS_position"] == 14383484

    (tmp_path / "CTCF_ChIP-Seq_chr21.csv").write_text(
        "chr,start,end,midpoint,fold\n"
        "chr21,14000000,14000400,14000200,7.5\n"
        "chr21,90000000,90000400,90000200,2.0\n")
    peaks = load_chip_data(str(tmp_path), "CTCF")
    assert peaks[0]["fold"] == 7.5 and peaks[0]["start"] == 14000000

    regions = {
        1: {"chr": "chr21", "start": 13800000, "end": 13900000},
        2: {"chr": "chr21", "start": 14000000, "end": 14500000},
    }
    rx, ry = match_peaks_to_regions(regions, peaks)
    assert list(rx) == [1, 2]
    np.testing.assert_allclose(ry, [0.0, 7.5])      # far peak unmatched
    rec = match_peaks_to_regions(regions, peaks, return_arrays=False)
    assert rec == {1: 0.0, 2: 7.5}

    rna2 = match_rna_to_dna(rna, regions)
    assert rna2["r13"]["DNA_id"] == 1
    assert "DNA_id" not in rna2["r14"]

    genes2 = match_gene_to_dna(genes, regions)
    assert genes2[2]["DNA_id"] == 2

    enh = {"e1": {"start": 13895000, "end": 13905000}}   # half inside r1
    reg3 = match_enhancers_to_dna(enh, regions)
    assert reg3[1]["enhancer_count"] == 0.5
    assert reg3[2]["enhancer_count"] == 0.0

    cu = ColorUsage(channels=["750", "647"],
                    usage={"H1R1": ["u1", "beads"],
                           "H2R2": ["beads", "u2"]})
    with pytest.raises(ValueError, match="not unique"):
        cu.bead_channel_index()
    cu2 = ColorUsage(channels=["750", "647"],
                     usage={"H1R1": ["u1", "beads"],
                            "H2R2": ["u2", "beads"]})
    assert cu2.bead_channel_index() == 1
    assert cu2.dapi_channel_index() is None


def test_native_loader_parity(tmp_path, rng):
    """Fused native read+de-interleave (io/native/daxload.cpp) must be
    byte-identical to read_dax + split_channels — both endiannesses,
    both entry points, out= blocks, and the no-toolchain fallback."""
    from imageanalysis3_tpu.io.native_loader import (
        load_dax_channels, split_channels_native, native_loader_available)

    assert native_loader_available()     # toolchain is baked in here

    n_z, buffer = 4, 3
    all_ch = ["750", "647", "561"]
    n_frames = n_z * 3 + 2 * buffer
    movie = rng.integers(0, 65535,
                         size=(n_frames, 16, 24)).astype(np.uint16)
    for big_endian in (False, True):
        path = str(tmp_path / f"fov_{big_endian}.dax")
        write_dax(path, movie, big_endian=big_endian)
        back, _ = read_dax(path)
        want = np.stack(split_channels(back, ["647", "750"], all_ch,
                                       n_z=n_z, buffer_frames=buffer))
        got = load_dax_channels(path, ["647", "750"], all_ch, n_z=n_z,
                                buffer_frames=buffer)
        np.testing.assert_array_equal(got, want)
        out = np.empty_like(want)
        got2 = load_dax_channels(path, ["647", "750"], all_ch, n_z=n_z,
                                 buffer_frames=buffer, out=out)
        assert got2 is out
        np.testing.assert_array_equal(out, want)

    native = split_channels_native(movie, all_ch, all_ch, n_z=n_z,
                                   buffer_frames=buffer)
    ref = np.stack(split_channels(movie, all_ch, all_ch, n_z=n_z,
                                  buffer_frames=buffer))
    np.testing.assert_array_equal(native, ref)

    # skip_frame0 start arithmetic flows through the shared helper
    got3 = load_dax_channels(str(tmp_path / "fov_False.dax"), ["750"],
                             all_ch, n_z=n_z - 1, buffer_frames=buffer,
                             skip_frame0=True)
    want3 = split_channels(movie, ["750"], all_ch, n_z=n_z - 1,
                           buffer_frames=buffer, skip_frame0=True)[0]
    np.testing.assert_array_equal(got3[0], want3)

    with pytest.raises(ValueError, match="frames"):
        load_dax_channels(str(tmp_path / "fov_False.dax"), ["750"],
                          all_ch, n_z=n_z + 10, buffer_frames=buffer)
    with pytest.raises(IOError):
        # oversized frame geometry -> preads past EOF must fail loudly
        load_dax_channels(str(tmp_path / "fov_False.dax"), ["750"],
                          all_ch, n_z=n_z, buffer_frames=buffer,
                          meta=DaxMetadata(number_frames=n_frames,
                                           image_height=4096,
                                           image_width=4096))


def test_microscope_geometry(tmp_path):
    """microscope.json transpose/flips for images and spot rows
    (reference segmentation_tools/cell.py:437-463,
    spot_tools/translating.py:95-117): image and spot transforms must
    agree — a bright voxel moves where its spot row says."""
    import json
    from imageanalysis3_tpu.io import (read_microscope_json,
                                       microscope_correct_image,
                                       microscope_translate_spots)

    params = {"transpose": True, "flip_horizontal": True,
              "flip_vertical": False}
    p = tmp_path / "microscope.json"
    p.write_text(json.dumps(params))
    assert read_microscope_json(str(p)) == params

    shape = (4, 8, 6)
    im = np.zeros(shape, np.float32)
    z0, x0, y0 = 2, 5, 1
    im[z0, x0, y0] = 7.0
    out = microscope_correct_image(im, params)
    assert out.shape == (4, 6, 8)                    # transposed xy
    (zz,), (xx,), (yy,) = np.where(out == 7.0)[0:1], \
        np.where(out == 7.0)[1:2], np.where(out == 7.0)[2:3]

    spots = np.zeros((1, 11), np.float32)
    spots[0, 1:4] = [z0, x0, y0]
    # spot transform uses the POST-transform image size (the reference
    # pipeline order); the reference mirrors coordinates as s - c
    # (spot_tools/translating.py:109-113), half a pixel off the voxel
    # mirror s-1-c, so require exact reference arithmetic and voxel
    # agreement within one pixel
    tr = microscope_translate_spots(spots, params, out.shape)
    np.testing.assert_allclose(tr[0, 1:4], [z0, y0, out.shape[2] - x0])
    assert np.max(np.abs(np.array([zz[0], xx[0], yy[0]])
                         - tr[0, 1:4])) <= 1.0

    # 2d path + no-op params
    im2 = microscope_correct_image(im[0], {"transpose": True})
    assert im2.shape == (6, 8)
    np.testing.assert_array_equal(
        microscope_correct_image(im, {}), im)
    with pytest.raises(TypeError):
        microscope_correct_image(im, None)
    with pytest.raises(ValueError):
        microscope_correct_image(im[0, 0], params)


# ---------------------------------------------------------------------------
# windowed disk reads (reference slice_image / crop_multi_channel_image_v2)

def _write_channel_movie(tmp_path, rng, n_z=8, hw=(24, 20), channels=3,
                         buffer_frames=4, empty_frames=0):
    from imageanalysis3_tpu.io import interleave_channels
    stacks = [rng.integers(0, 60000, size=(n_z,) + hw).astype(np.uint16)
              for _ in range(channels)]
    movie = interleave_channels(stacks, buffer_frames=buffer_frames,
                                empty_frames=empty_frames)
    path = str(tmp_path / "win_zscan_00.dax")
    write_dax(path, movie)
    return path, stacks, movie


def test_read_dax_window_matches_full_read(tmp_path, rng):
    """Partial read == the same slice of the full movie, incl. the
    interleaved zstep/zstart layout (visual_tools.py:2073-2183)."""
    from imageanalysis3_tpu.io import read_dax_window
    movie = rng.integers(0, 65535, size=(13, 16, 18)).astype(np.uint16)
    path = str(tmp_path / "w.dax")
    write_dax(path, movie)
    (w,) = read_dax_window(path, (3, 11), (2, 9), (5, 17))
    np.testing.assert_array_equal(w, movie[3:11, 2:9, 5:17])
    # strided multi-start: channel layout with 3 colors
    a, b = read_dax_window(path, (2, 12), None, (0, 10), zstep=3,
                           zstarts=[1, 0])
    np.testing.assert_array_equal(a, movie[4:12:3, :, 0:10])
    np.testing.assert_array_equal(b, movie[3:12:3, :, 0:10])
    # limits clamp + swapped order tolerated
    (c,) = read_dax_window(path, (11, 3), (0, 99), (0, 18))
    np.testing.assert_array_equal(c, movie[3:11])


def test_read_channel_crops_no_drift(tmp_path, rng):
    from imageanalysis3_tpu.io import read_channel_crops
    path, stacks, _ = _write_channel_movie(tmp_path, rng)
    chans = ["750", "647", "561"]
    crops = read_channel_crops(
        path, ["647", "561"], [[2, 6], [3, 17], [4, -2]],
        all_channels=chans, n_z=8, buffer_frames=4)
    np.testing.assert_array_equal(crops[0], stacks[1][2:6, 3:17, 4:18])
    np.testing.assert_array_equal(crops[1], stacks[2][2:6, 3:17, 4:18])
    # 2x2 limits -> full z; limits returned
    crops, lims = read_channel_crops(
        path, ["750"], [[1, 9], [0, 12]], all_channels=chans, n_z=8,
        buffer_frames=4, return_limits=True)
    np.testing.assert_array_equal(crops[0], stacks[0][:, 1:9, 0:12])
    np.testing.assert_array_equal(lims, [[0, 8], [1, 9], [0, 12]])


def test_read_channel_crops_drift_matches_fullfov_warp(tmp_path, rng):
    """The windowed drift resample must equal warp-the-whole-FOV-then-crop
    (the full-FOV path's warp_image_drift) away from image borders, for
    the SAME stored drift sign."""
    import jax.numpy as jnp
    from imageanalysis3_tpu.io import read_channel_crops
    from imageanalysis3_tpu.ops.warp import warp_image_drift
    path, stacks, _ = _write_channel_movie(tmp_path, rng, n_z=10,
                                           hw=(28, 26))
    drift = np.array([0.7, -1.3, 2.4], np.float32)
    full = np.asarray(warp_image_drift(jnp.asarray(stacks[1], jnp.float32),
                                       jnp.asarray(drift)))
    lims = [[3, 8], [4, 22], [5, 20]]
    (crop,) = read_channel_crops(path, ["647"], lims,
                                 all_channels=["750", "647", "561"],
                                 n_z=10, buffer_frames=4, drift=drift)
    # the factorized full-FOV warp and the direct trilinear gather round
    # differently in float32; 0.1 on a 60000-count scale is pure rounding
    np.testing.assert_allclose(
        crop, full[3:8, 4:22, 5:20], rtol=0, atol=0.1)


def test_remove_dax_channels(tmp_path, rng):
    from imageanalysis3_tpu.io import (read_dax, remove_dax_channels,
                                       split_channels)
    path, stacks, _ = _write_channel_movie(tmp_path, rng)
    target = str(tmp_path / "kept.dax")
    kept = remove_dax_channels(path, target, ["561", "750"],
                               ["750", "647", "561"], n_z=8,
                               buffer_frames=4)
    assert kept == ["561", "750"]
    back, meta = read_dax(target)
    assert meta.number_frames == 2 * 8 + 2 * 4
    out = split_channels(back, ["561", "750"], ["561", "750"], n_z=8,
                         buffer_frames=4)
    np.testing.assert_array_equal(out[0], stacks[2])
    np.testing.assert_array_equal(out[1], stacks[0])
    with pytest.raises(FileExistsError):
        remove_dax_channels(path, target, ["750"], ["750", "647", "561"],
                            n_z=8, buffer_frames=4)
