"""Dataset registry (reference `ngp_pl/datasets/__init__.py:8-12`) plus the
new procedural `synthetic` dataset."""
from google_nerf_tpu.data.base import BaseDataset
from google_nerf_tpu.data.colmap import ColmapDataset
from google_nerf_tpu.data.nerfpp import NeRFPPDataset
from google_nerf_tpu.data.nsvf import NSVFDataset
from google_nerf_tpu.data.rtmv import RTMVDataset
from google_nerf_tpu.data.scannet import ScannetDataset
from google_nerf_tpu.data.synthetic import SyntheticDataset

dataset_dict = {
    "nsvf": NSVFDataset,
    "colmap": ColmapDataset,
    "rtmv": RTMVDataset,
    "nerfpp": NeRFPPDataset,
    "scannet": ScannetDataset,
    "synthetic": SyntheticDataset,
}

__all__ = ["BaseDataset", "ColmapDataset", "NeRFPPDataset", "NSVFDataset",
           "RTMVDataset", "ScannetDataset", "SyntheticDataset",
           "dataset_dict"]
