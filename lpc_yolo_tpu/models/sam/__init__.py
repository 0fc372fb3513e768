"""SAM / MobileSAM promptable segmentation (reference models/sam/, 2816 LoC)."""

from .model import SAM, MobileSam  # noqa: F401
from .port import load_torch_sam, port_sam_state_dict  # noqa: F401
