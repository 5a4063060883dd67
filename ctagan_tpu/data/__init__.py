from ctagan_tpu.data.dicom import DicomFile, read_dicom, write_dicom, generate_uid
from ctagan_tpu.data.datasets import (
    PairedSliceDataset,
    DualWindowDataset,
    read_fullrange_slice,
    read_dual_window_slice,
)
