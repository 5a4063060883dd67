"""Corpus builder + registration tests (hermetic synthetic DICOM trees)."""
import os

import numpy as np
import pytest

from ctagan_tpu.data.corpus import (
    CorpusStats,
    build_lists,
    collect_pairs,
    make_equip_split,
    patient_split,
    statistic,
)
from ctagan_tpu.data.dicom import make_ct_slice, read_dicom, write_dicom
from ctagan_tpu.data.fixtures import make_corpus, synthetic_ct_pixels
from ctagan_tpu.data.registration import (
    _load_series,
    align_patient,
    dicom_to_nii,
    invert_lists,
    nii_to_dicom,
    phase_correlation_shift,
    register_syn,
    register_translation,
)


def _tree(root, n_patients=5, slices=2, manufacturers=None):
    rng = np.random.default_rng(0)
    manufacturers = manufacturers or ["GE MEDICAL SYSTEMS"] * n_patients
    for p in range(n_patients):
        for se, desc in (("SE0", "C-"), ("SE1", "C+")):
            d = os.path.join(root, f"pat{p}", "ST0", se)
            os.makedirs(d, exist_ok=True)
            uid = f"1.2.{p}.{1 if se == 'SE1' else 0}"  # one UID per series
            for s in range(slices):
                ds = make_ct_slice(
                    synthetic_ct_pixels(rng, 16, contrast=(se == "SE1")),
                    series_description=desc,
                    patient_id=f"P{p}",
                    accession=f"A{p}",
                    slice_location=float(s),
                    manufacturer=manufacturers[p],
                    series_uid=uid,
                )
                write_dicom(ds, os.path.join(d, f"IM{s}"))


def test_collect_pairs_and_split(tmp_path):
    _tree(str(tmp_path), n_patients=5, slices=2)
    stats = CorpusStats()
    by_patient = collect_pairs(str(tmp_path), stats)
    assert len(by_patient) == 5
    assert stats.slices == 10
    train, val, test = patient_split(by_patient, seed=0)
    assert len(train) + len(val) + len(test) == 10
    # patient-level: a patient's slices never straddle splits
    def pats(paths):
        return {p.split("pat")[1].split("/")[0] for p in paths}

    assert not (pats(train) & pats(val)) and not (pats(train) & pats(test))


def test_integrity_filters(tmp_path):
    _tree(str(tmp_path), n_patients=1, slices=1)
    # corrupt: change accession of the SE1 partner
    p1 = os.path.join(str(tmp_path), "pat0", "ST0", "SE1", "IM0")
    ds = read_dicom(p1)
    ds.set_str((0x0008, 0x0050), "DIFFERENT", b"SH")
    write_dicom(ds, p1)
    stats = CorpusStats()
    by_patient = collect_pairs(str(tmp_path), stats)
    assert stats.rejected_accession == 1
    assert not by_patient


def test_swapped_series_repair(tmp_path):
    _tree(str(tmp_path), n_patients=1, slices=1)
    # swap the descriptions so SE0 looks contrasted
    for se, desc in (("SE0", "C+"), ("SE1", "C-")):
        p = os.path.join(str(tmp_path), "pat0", "ST0", se, "IM0")
        ds = read_dicom(p)
        ds.set_str((0x0008, 0x103E), desc, b"LO")
        write_dicom(ds, p)
    stats = CorpusStats()
    collect_pairs(str(tmp_path), stats)
    assert stats.swapped_pairs == 1


def test_build_lists_and_statistic(tmp_path):
    _tree(str(tmp_path), n_patients=5, slices=2)
    out = build_lists(str(tmp_path), str(tmp_path / "lists"), seed=1)
    assert set(out) == {"train", "val", "test"}
    st = statistic(out["train"])
    assert st.slices > 0 and st.patients > 0
    assert "GE" in st.by_manufacturer


def test_make_equip_split(tmp_path):
    _tree(
        str(tmp_path),
        n_patients=3,
        slices=1,
        manufacturers=["GE MEDICAL SYSTEMS", "SIEMENS", "Philips"],
    )
    out = build_lists(str(tmp_path), str(tmp_path / "lists"), seed=0)
    # merge all lists into one for the split
    allp = str(tmp_path / "lists" / "all.txt")
    with open(allp, "w") as f:
        for k in out.values():
            f.write(open(k).read())
    groups = make_equip_split(allp, str(tmp_path / "lists"))
    assert set(groups) == {"GE", "SIEMENS", "PHILIPS"}


def test_phase_correlation_recovers_shift():
    rng = np.random.default_rng(2)
    vol = rng.uniform(0, 1, (8, 32, 32))
    shifted = np.roll(vol, (1, 3, -2), axis=(0, 1, 2))
    shift = phase_correlation_shift(vol, shifted)
    np.testing.assert_array_equal(shift, [-1, -3, 2])


def test_register_translation_roundtrip(tmp_path):
    _tree(str(tmp_path), n_patients=1, slices=4)
    # shift all CTA slices spatially by (5, -3)
    base = os.path.join(str(tmp_path), "pat0", "ST0", "SE1")
    for f in os.listdir(base):
        p = os.path.join(base, f)
        ds = read_dicom(p)
        ds.set_pixel_data(np.roll(ds.pixel_array(), (5, -3), axis=(0, 1)))
        write_dicom(ds, p)
    shift = register_translation(str(tmp_path), "pat0")
    assert tuple(shift[1:]) == (-5, 3)  # undoes the spatial shift


class _MockAntsImage:
    def __init__(self, arr):
        self.arr = np.asarray(arr)

    def numpy(self):
        return self.arr


class _MockAnts:
    """Minimal antspyx stand-in: 'SyN' = exact phase-correlation rigid
    alignment, transform list carries the found shift. Exercises the full
    register_syn orchestration path (data_process.py:523-653) hermetically."""

    calls = []

    @staticmethod
    def from_numpy(a):
        return _MockAntsImage(a)

    @staticmethod
    def registration(fixed, moving, type_of_transform):
        assert type_of_transform == "SyN"
        shift = phase_correlation_shift(fixed.arr, moving.arr)
        _MockAnts.calls.append(("registration", tuple(shift)))
        return {"fwdtransforms": [tuple(int(s) for s in shift)]}

    @staticmethod
    def apply_transforms(fixed, moving, transformlist, interpolator="linear"):
        assert interpolator == "linear"
        (shift,) = transformlist
        return _MockAntsImage(np.roll(moving.arr, shift, axis=(0, 1, 2)))


def _patterned_tree(root, slices=6, shift=(2, 3), offset=100):
    """One patient; SE1 = in-plane circularly shifted SE0 pattern + contrast
    offset, so perfect registration has an exact, wrap-free ground truth."""
    rng = np.random.default_rng(3)
    base = [
        (rng.integers(200, 3000, (16, 16))).astype(np.uint16)
        for _ in range(slices)
    ]
    for se in ("SE0", "SE1"):
        d = os.path.join(root, "pat0", "ST0", se)
        os.makedirs(d, exist_ok=True)
        for s in range(slices):
            px = base[s]
            if se == "SE1":
                px = np.roll(px, shift, axis=(0, 1)) + offset
            ds = make_ct_slice(
                px.astype(np.uint16),
                series_description="C-" if se == "SE0" else "C+",
                patient_id="P0",
                accession="A0",
                slice_location=float(s),
                series_uid="1.2.3." + ("1" if se == "SE1" else "0"),
            )
            write_dicom(ds, os.path.join(d, f"IM{s}"))
    return base


def test_nii_view_roundtrip_identity():
    v = np.random.default_rng(0).normal(size=(5, 7, 9)).astype(np.float32)
    np.testing.assert_array_equal(nii_to_dicom(dicom_to_nii(v)), v)


def test_longest_series_selection(tmp_path):
    d = os.path.join(str(tmp_path), "SE0")
    os.makedirs(d)
    # 3-slice main series + a 1-slice scout with its own SeriesInstanceUID
    main_uid = "1.2.3.4"
    for s in range(3):
        ds = make_ct_slice(
            np.full((8, 8), 1000 + s, np.uint16),
            slice_location=float(s),
            series_uid=main_uid,
        )
        write_dicom(ds, os.path.join(d, f"IM{s}"))
    scout = make_ct_slice(
        np.zeros((8, 8), np.uint16), slice_location=-50.0, series_uid="9.9.9"
    )
    write_dicom(scout, os.path.join(d, "IM99"))
    vol, paths = _load_series(d)
    assert vol.shape[0] == 3 and len(paths) == 3
    assert all("IM99" not in p for p in paths)


def test_align_patient_syn_mock_geometry(tmp_path):
    base = _patterned_tree(str(tmp_path), slices=6, shift=(2, 3), offset=100)
    se0_before, _ = _load_series(
        os.path.join(str(tmp_path), "pat0", "ST0", "SE0")
    )
    method = register_syn(str(tmp_path), "pat0", ants_module=_MockAnts)
    assert method == "syn" and _MockAnts.calls
    se0_after, _ = _load_series(
        os.path.join(str(tmp_path), "pat0", "ST0", "SE0")
    )
    se1_after, _ = _load_series(
        os.path.join(str(tmp_path), "pat0", "ST0", "SE1")
    )
    # SE0 writeback is the identity round trip (:608-625 + the axis ledger)
    np.testing.assert_array_equal(se0_after, se0_before)
    # SE1 aligned exactly: shifted pattern rolled back onto SE0 + offset...
    expected = np.stack(
        [b.astype(np.float32) - 1024.0 + 100.0 for b in base]
    )
    np.testing.assert_array_equal(se1_after[:-1], expected[:-1])
    # ...except the reference's NIfTI z=0 quirk slice (:634-636), which is
    # written UNWARPED (z=0 in nii view = LAST slice in location order)
    moving_last = np.roll(base[-1], (2, 3), axis=(0, 1)).astype(np.float32)
    np.testing.assert_array_equal(se1_after[-1], moving_last - 1024.0 + 100.0)


def test_align_patient_skips_short_series(tmp_path):
    _patterned_tree(str(tmp_path), slices=3)
    assert align_patient(str(tmp_path), "pat0", ants_module=_MockAnts) is None


def test_align_patient_translation_fallback(tmp_path):
    _patterned_tree(str(tmp_path), slices=6, shift=(5, -3), offset=0)
    method = align_patient(
        str(tmp_path), "pat0", ants_module=None, method="translation"
    )
    assert method == "translation"
    se1_after, _ = _load_series(
        os.path.join(str(tmp_path), "pat0", "ST0", "SE1")
    )
    se0_after, _ = _load_series(
        os.path.join(str(tmp_path), "pat0", "ST0", "SE0")
    )
    np.testing.assert_array_equal(se1_after, se0_after)


def test_invert_lists_roundtrip(tmp_path):
    _patterned_tree(str(tmp_path), slices=5)
    p_se0 = os.path.join(str(tmp_path), "pat0", "ST0", "SE0")
    files = sorted(os.listdir(p_se0))
    lst = os.path.join(str(tmp_path), "list.txt")
    with open(lst, "w") as f:
        for name in files:
            f.write(os.path.join(p_se0, name) + "\n")
    before = read_dicom(os.path.join(p_se0, files[0])).pixel_array().copy()
    before_b = read_dicom(
        os.path.join(p_se0, files[0]).replace("SE0", "SE1")
    ).pixel_array().copy()
    assert invert_lists(lst) == 5
    after = read_dicom(os.path.join(p_se0, files[0])).pixel_array()
    after_b = read_dicom(
        os.path.join(p_se0, files[0]).replace("SE0", "SE1")
    ).pixel_array()
    np.testing.assert_array_equal(after, np.flip(before, axis=1))
    np.testing.assert_array_equal(after_b, np.flip(before_b, axis=1))
    # involution: a second pass restores the originals
    invert_lists(lst)
    np.testing.assert_array_equal(
        read_dicom(os.path.join(p_se0, files[0])).pixel_array(), before
    )


def test_deterministic_vessel_fixture():
    """Vessel trees are parametric + reproducible, the NCCT/CTA pair differs
    ONLY by the deterministic enhancement, and the windowed vessel protocol
    is discriminative on it (VERDICT r1 #5)."""
    from ctagan_tpu.data.fixtures import synthetic_ct_pixels, vessel_tree_mask
    from ctagan_tpu.data.native import fullrange_native
    from ctagan_tpu.train.evaluation import evaluate_pair

    m1 = vessel_tree_mask(64, 2.0, patient_seed=42)
    m2 = vessel_tree_mask(64, 2.0, patient_seed=42)
    np.testing.assert_array_equal(m1, m2)
    assert m1.any()
    assert not np.array_equal(m1, vessel_tree_mask(64, 2.0, patient_seed=43))
    assert not np.array_equal(m1, vessel_tree_mask(64, 5.0, patient_seed=42))

    rng = np.random.default_rng(0)
    noise = rng.normal(0, 12, (64, 64)).astype(np.float32)
    ncct = synthetic_ct_pixels(rng, 64, False, vessel_mask=m1, noise=noise)
    cta = synthetic_ct_pixels(rng, 64, True, vessel_mask=m1, noise=noise)
    diff = ncct.astype(int) != cta.astype(int)
    assert diff[m1].all() and not diff[~m1].any()

    # a near-perfect prediction scores far above the no-enhancement baseline
    # under the reference's windowed vessel metric -> the metric can now
    # tell a good model from a bad one
    fr_n = fullrange_native(ncct.astype(np.int32))
    fr_c = fullrange_native(cta.astype(np.int32))
    good = np.clip(fr_c + 0.001 * np.random.default_rng(1).normal(
        size=fr_c.shape
    ).astype(np.float32), -1, 1)
    row_good = evaluate_pair(good, fr_c, 50.0, 400.0)
    row_bad = evaluate_pair(fr_n, fr_c, 50.0, 400.0)
    assert row_good["PSNRw"] > row_bad["PSNRw"] + 10


def test_swapped_series_repair_moves_files(tmp_path):
    _tree(str(tmp_path), n_patients=1, slices=1)
    p0 = os.path.join(str(tmp_path), "pat0", "ST0", "SE0", "IM0")
    p1 = os.path.join(str(tmp_path), "pat0", "ST0", "SE1", "IM0")
    # swap descriptions so the CTA sits in SE0
    for p, desc in ((p0, "C+"), (p1, "C-")):
        ds = read_dicom(p)
        ds.set_str((0x0008, 0x103E), desc, b"LO")
        write_dicom(ds, p)
    cta_pixels = read_dicom(p0).pixel_array()
    stats = CorpusStats()
    by_patient = collect_pairs(str(tmp_path), stats)
    assert stats.swapped_pairs == 1
    # after repair the CTA pixels physically live under SE1
    np.testing.assert_array_equal(read_dicom(p1).pixel_array(), cta_pixels)
    assert read_dicom(p0).series_description == "C-"
    assert by_patient  # pair now valid and kept


def test_swapped_series_reject_mode(tmp_path):
    _tree(str(tmp_path), n_patients=1, slices=1)
    for se, desc in (("SE0", "C+"), ("SE1", "C-")):
        p = os.path.join(str(tmp_path), "pat0", "ST0", se, "IM0")
        ds = read_dicom(p)
        ds.set_str((0x0008, 0x103E), desc, b"LO")
        write_dicom(ds, p)
    stats = CorpusStats()
    by_patient = collect_pairs(str(tmp_path), stats, repair=False)
    assert stats.swapped_pairs == 1 and not by_patient


def _reference_repair_tree(root):
    """A messy tree exercising every reference repair rule."""
    _tree(root, n_patients=1, slices=4)  # pat0: clean, 4 pairs
    # pat1: SE2 leftovers + SE1 has an extra unmatched file
    _tree2 = os.path.join(root, "pat1")
    _tree(root, n_patients=2, slices=2)  # creates pat0 (noop) + pat1
    se2 = os.path.join(_tree2, "ST0", "SE2")
    os.makedirs(se2, exist_ok=True)
    with open(os.path.join(se2, "IM0"), "wb") as f:
        f.write(b"stale synthesis output")
    extra = os.path.join(_tree2, "ST0", "SE1", "IM9")
    src = os.path.join(_tree2, "ST0", "SE1", "IM0")
    import shutil

    shutil.copy(src, extra)
    return root


def test_reference_repair_se2_purge_and_unmatched_delete(tmp_path):
    from ctagan_tpu.data.corpus import repair_reference_tree

    root = _reference_repair_tree(str(tmp_path))
    stats = CorpusStats()
    repair_reference_tree(root, stats)
    assert stats.se2_purged == 1
    assert not os.path.isdir(os.path.join(root, "pat1", "ST0", "SE2"))
    # the unmatched SE1/IM9 was deleted; counts now equal -> patient kept
    assert stats.deleted_unmatched == 1
    assert not os.path.exists(os.path.join(root, "pat1", "ST0", "SE1", "IM9"))
    assert os.path.isdir(os.path.join(root, "pat1"))


def test_reference_repair_series_count_swap(tmp_path):
    """len(SE0) an integer multiple of len(SE1) -> whole-series rename
    dance (data_process.py:44-47): SE0 and SE1 swap directories."""
    from ctagan_tpu.data.corpus import repair_reference_tree

    root = str(tmp_path)
    _tree(root, n_patients=1, slices=4)
    se1 = os.path.join(root, "pat0", "ST0", "SE1")
    # SE1 down to 2 files: 4 % 2 == 0 triggers the swap
    os.remove(os.path.join(se1, "IM2"))
    os.remove(os.path.join(se1, "IM3"))
    stats = CorpusStats()
    repair_reference_tree(root, stats)
    assert stats.series_renamed == 1
    # post-swap: SE0 holds the old SE1 (2 files), deletion pass removed
    # SE1 files without an SE0 partner, counts equalized -> patient kept
    se0_files = sorted(os.listdir(os.path.join(root, "pat0", "ST0", "SE0")))
    se1_files = sorted(os.listdir(os.path.join(root, "pat0", "ST0", "SE1")))
    assert se0_files == ["IM0", "IM1"]
    assert se1_files == ["IM0", "IM1"]
    assert stats.deleted_unmatched == 2


def test_reference_repair_removes_mismatched_patient(tmp_path):
    from ctagan_tpu.data.corpus import repair_reference_tree

    root = str(tmp_path)
    _tree(root, n_patients=1, slices=3)
    # SE1 down to 2 of 3: 3 % 2 != 0 -> no swap; unmatched pass can't fix
    # the SE0 surplus -> counts still differ -> patient rmtree'd
    os.remove(os.path.join(root, "pat0", "ST0", "SE1", "IM2"))
    stats = CorpusStats()
    repair_reference_tree(root, stats)
    assert stats.removed_patient_dirs == 1
    assert not os.path.isdir(os.path.join(root, "pat0"))


def test_reference_mode_removes_duplicate_patient_id(tmp_path):
    root = str(tmp_path)
    _tree(root, n_patients=2, slices=2)
    # pat1's headers claim pat0's PatientID
    for se in ("SE0", "SE1"):
        for im in ("IM0", "IM1"):
            p = os.path.join(root, "pat1", "ST0", se, im)
            ds = read_dicom(p)
            ds.set_str((0x0010, 0x0020), "P0", b"LO")
            write_dicom(ds, p)
    stats = CorpusStats()
    by_patient = collect_pairs(root, stats, repair="reference")
    assert stats.removed_patient_dirs == 1
    assert not os.path.isdir(os.path.join(root, "pat1"))
    assert list(by_patient) == ["P0"]
    # default mode on the same shape: non-destructive first-wins de-dup
    root2 = str(tmp_path / "keep")
    os.makedirs(root2)
    _tree(root2, n_patients=2, slices=2)
    for se in ("SE0", "SE1"):
        for im in ("IM0", "IM1"):
            p = os.path.join(root2, "pat1", "ST0", se, im)
            ds = read_dicom(p)
            ds.set_str((0x0010, 0x0020), "P0", b"LO")
            write_dicom(ds, p)
    by2 = collect_pairs(root2, CorpusStats(), repair=True)
    assert os.path.isdir(os.path.join(root2, "pat1"))  # nothing deleted
    assert list(by2) == ["P0"]


def test_reference_mode_rejects_ambiguous_contrast(tmp_path):
    root = str(tmp_path)
    _tree(root, n_patients=1, slices=2)
    # both series claim C+ on one slice pair -> reference skips it
    for se in ("SE0", "SE1"):
        p = os.path.join(root, "pat0", "ST0", se, "IM0")
        ds = read_dicom(p)
        ds.set_str((0x0008, 0x103E), "C+", b"LO")
        write_dicom(ds, p)
    stats = CorpusStats()
    by_patient = collect_pairs(root, stats, repair="reference")
    assert stats.rejected_contrast == 1
    assert stats.slices == 1  # the clean pair survives
    # default mode keeps ambiguous pairs (documented divergence)
    root2 = str(tmp_path / "dflt")
    os.makedirs(root2)
    _tree(root2, n_patients=1, slices=2)
    for se in ("SE0", "SE1"):
        p = os.path.join(root2, "pat0", "ST0", se, "IM0")
        ds = read_dicom(p)
        ds.set_str((0x0008, 0x103E), "C+", b"LO")
        write_dicom(ds, p)
    st2 = CorpusStats()
    collect_pairs(root2, st2, repair=True)
    assert st2.slices == 2
