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
    phase_correlation_shift,
    register_translation,
)


def _tree(root, n_patients=5, slices=2, manufacturers=None):
    rng = np.random.default_rng(0)
    manufacturers = manufacturers or ["GE MEDICAL SYSTEMS"] * n_patients
    for p in range(n_patients):
        for se, desc in (("SE0", "C-"), ("SE1", "C+")):
            d = os.path.join(root, f"pat{p}", "ST0", se)
            os.makedirs(d, exist_ok=True)
            for s in range(slices):
                ds = make_ct_slice(
                    synthetic_ct_pixels(rng, 16, contrast=(se == "SE1")),
                    series_description=desc,
                    patient_id=f"P{p}",
                    accession=f"A{p}",
                    slice_location=float(s),
                    manufacturer=manufacturers[p],
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
