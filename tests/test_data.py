"""DICOM codec + dataset + loader tests (hermetic via synthetic fixtures)."""
import os

import numpy as np
import pytest

from ctagan_tpu.data.dicom import (
    DicomFile,
    generate_uid,
    make_ct_slice,
    read_dicom,
    write_dicom,
)
from ctagan_tpu.data.datasets import (
    DualWindowDataset,
    PairedSliceDataset,
    read_dual_window_slice,
    read_fullrange_slice,
)
from ctagan_tpu.data.fixtures import make_corpus, synthetic_ct_pixels
from ctagan_tpu.data.loader import PrefetchLoader


def test_dicom_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    px = rng.integers(0, 4096, (32, 32)).astype(np.uint16)
    ds = make_ct_slice(px, wc=60.0, ww=300.0, slice_location=12.5)
    p = tmp_path / "IM0"
    write_dicom(ds, p)
    back = read_dicom(str(p))
    np.testing.assert_array_equal(back.pixel_array(), px)
    assert back.rows == 32 and back.cols == 32
    assert back.bits_allocated == 16
    assert back.window_center == 60.0 and back.window_width == 300.0
    assert back.rescale_intercept == -1024.0
    assert back.slice_location == 12.5
    assert back.series_description == "C-"
    assert back.patient_id == "P0"


def test_dicom_hu_array():
    px = np.full((4, 4), 1024, np.uint16)
    ds = make_ct_slice(px)
    np.testing.assert_allclose(ds.hu_array(), 0.0)  # 1024 - 1024


def test_dicom_writeback_replaces_pixels_and_uid(tmp_path):
    px = np.zeros((16, 16), np.uint16)
    ds = make_ct_slice(px)
    p0 = tmp_path / "orig"
    write_dicom(ds, p0)

    ds2 = read_dicom(str(p0))
    new = np.arange(256, dtype=np.int32).reshape(16, 16)
    old_uid = ds2.series_instance_uid
    ds2.set_pixel_data(new)
    ds2.series_instance_uid = generate_uid()
    p1 = tmp_path / "synth"
    write_dicom(ds2, p1)

    ds3 = read_dicom(str(p1))
    np.testing.assert_array_equal(ds3.pixel_array(), new.astype(np.int16))
    assert ds3.series_instance_uid != old_uid


def test_dicom_multivalued_ds():
    ds = make_ct_slice(np.zeros((4, 4), np.uint16))
    ds.set_str((0x0028, 0x1050), "40\\400", b"DS")
    assert ds.get_ds((0x0028, 0x1050)) == [40.0, 400.0]
    assert ds.window_center == 40.0  # first value, like the reference's WC[0]


def test_dicom_implicit_vr_parse(tmp_path):
    ds = make_ct_slice(np.ones((8, 8), np.uint16))
    ds.transfer_syntax = "1.2.840.10008.1.2"
    ds.meta = [
        type(ds.meta[0])(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2\x00")
    ]
    p = tmp_path / "implicit"
    write_dicom(ds, p)
    back = read_dicom(str(p))
    assert back.transfer_syntax == "1.2.840.10008.1.2"
    np.testing.assert_array_equal(back.pixel_array(), np.ones((8, 8), np.int16))


def test_read_fullrange_and_dual_window(tmp_path):
    rng = np.random.default_rng(1)
    px = synthetic_ct_pixels(rng, 32)
    ds = make_ct_slice(px)
    p = tmp_path / "IM0"
    write_dicom(ds, p)

    fr = read_fullrange_slice(str(p))
    want = ((np.clip(px.astype(np.float32), 0, None) / 4095.0) - 0.5) / 0.5
    np.testing.assert_allclose(fr, want, atol=1e-6)

    w, f = read_dual_window_slice(str(p))
    np.testing.assert_allclose(f, want, atol=1e-6)
    assert w.min() >= -1 and w.max() <= 1
    # jnp dual_window agrees with the host implementation
    from ctagan_tpu.ops.windowing import dual_window

    jw, jf = dual_window(px.astype(np.float32))
    np.testing.assert_allclose(np.asarray(jw), w, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jf), f, atol=1e-6)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    lists = make_corpus(str(root), n_patients=2, slices_per_patient=3, size=32)
    return root, lists


def test_paired_dataset(corpus):
    _, lists = corpus
    ds = PairedSliceDataset(lists["train"])
    assert len(ds) >= 1
    item = ds[0]
    assert item["A"].shape == (32, 32, 1)
    assert item["B"].shape == (32, 32, 1)
    assert "SE0" in item["A_path"]
    # A and B come from different series (CTA has vessels -> differs)
    assert not np.allclose(item["A"], item["B"])


def test_dual_window_dataset_and_oversampling(corpus, tmp_path):
    root, lists = corpus
    item = DualWindowDataset(lists["train"])[0]
    for k in ("A1", "A2", "B1", "B2"):
        assert item[k].shape == (32, 32, 1)

    # oversampling: train + traind1 (once) + traind2 (3..5 times)
    base = open(lists["train"]).read()
    d1 = str(lists["train"]).replace("train", "traind1")
    d2 = str(lists["train"]).replace("train", "traind2")
    open(d1, "w").write(base)
    open(d2, "w").write(base)
    n_base = len(base.strip().splitlines())
    rng = np.random.default_rng(0)
    sizes = set()
    for _ in range(12):
        ds = DualWindowDataset(lists["train"], oversample=True, rng=rng)
        assert len(ds) % n_base == 0
        factor = len(ds) // n_base
        assert 5 <= factor <= 7  # 1 base + 1 d1 + 3..5 d2
        sizes.add(factor)
    assert len(sizes) > 1  # stochastic across epochs
    os.remove(d1)
    os.remove(d2)


def test_prefetch_loader_batching_and_shuffle(corpus):
    _, lists = corpus
    ds = PairedSliceDataset(lists["train"])
    loader = PrefetchLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    batches = list(loader)
    assert sum(b["A"].shape[0] for b in batches) == len(ds)
    assert batches[0]["A"].shape[1:] == (32, 32, 1)
    assert isinstance(batches[0]["A_path"], list)

    l2 = PrefetchLoader(
        ds, batch_size=1, shuffle=True, rng=np.random.default_rng(1)
    )
    order1 = [b["A_path"][0] for b in l2]
    order2 = [b["A_path"][0] for b in l2]
    assert sorted(order1) == sorted(order2)


def test_prefetch_loader_drop_last(corpus):
    _, lists = corpus
    ds = PairedSliceDataset(lists["train"])
    if len(ds) % 2 == 1:
        loader = PrefetchLoader(ds, batch_size=2, drop_last=True)
        assert len(list(loader)) == len(ds) // 2


def test_loader_shard_equal_lengths(corpus):
    _, lists = corpus
    ds = PairedSliceDataset(lists["train"])  # 2 items
    import numpy as np
    from ctagan_tpu.data.loader import PrefetchLoader as PL

    # 2 items over 2 shards -> 1 each; over 3 shards -> 0 each (truncated)
    l0 = PL(ds, batch_size=1, shard=(0, 2))
    l1 = PL(ds, batch_size=1, shard=(1, 2))
    assert len(l0) == len(l1) == 1
    assert len(list(l0)) == len(list(l1)) == 1
    # uneven: synthetic 3-item dataset over 2 shards -> both see 1
    class Fake:
        def __len__(self):
            return 3
        def __getitem__(self, i):
            return {"A": np.zeros((2, 2, 1), np.float32)}
    la = PL(Fake(), batch_size=1, shard=(0, 2))
    lb = PL(Fake(), batch_size=1, shard=(1, 2))
    assert len(list(la)) == len(list(lb)) == 1


def test_loader_abandoned_iteration_does_not_hang(corpus):
    _, lists = corpus
    ds = PairedSliceDataset(lists["train"])
    loader = PrefetchLoader(ds, batch_size=1, prefetch=1)
    import threading, time
    it = iter(loader)
    next(it)
    del it  # abandon mid-iteration
    time.sleep(0.3)
    # a second full pass must still work (no deadlocked state)
    assert len(list(loader)) == len(loader)


def test_unaligned_resamples_across_accesses(corpus, tmp_path):
    _, lists = corpus
    # enough B candidates to make identical 20-draw sequences implausible
    import numpy as np
    ds = PairedSliceDataset(lists["train"], unaligned=True)
    if len(ds.files_b) < 2:
        return
    draws1 = [ds[0]["B"].sum() for _ in range(20)]
    assert len({float(x) for x in draws1}) > 1


def test_context_slices_dataset(corpus):
    _, lists = corpus
    import numpy as np
    ds = PairedSliceDataset(lists["train"], context_slices=3)
    item = ds[0]
    assert item["A"].shape == (32, 32, 3)
    assert item["B"].shape == (32, 32, 1)
    # center channel == the plain single-slice read
    plain = PairedSliceDataset(lists["train"])[0]["A"]
    np.testing.assert_array_equal(item["A"][..., 1:2], plain)
    # series edges clamp (first slice: ch0 == ch1)
    np.testing.assert_array_equal(item["A"][..., 0], item["A"][..., 1])


def test_loader_surfaces_decode_errors(corpus):
    _, lists = corpus

    class Broken:
        def __len__(self):
            return 4
        def __getitem__(self, i):
            if i == 2:
                raise IOError("corrupt DICOM")
            import numpy as np
            return {"A": np.zeros((2, 2, 1), np.float32)}

    loader = PrefetchLoader(Broken(), batch_size=1)
    with pytest.raises(RuntimeError, match="item 2"):
        list(loader)
