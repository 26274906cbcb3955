"""Model family: one configurable BidPointFlowNet covering the reference's
teacher + student variants (SURVEY.md §2.1 items 7-15)."""

from .bid_pointflow import BidPointFlowNet
from .bridge import Bridge
from .config import PRESETS, ModelConfig, tiny_config

__all__ = ["BidPointFlowNet", "Bridge", "PRESETS", "ModelConfig",
           "tiny_config"]
