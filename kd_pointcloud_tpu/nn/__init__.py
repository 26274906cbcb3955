"""Neural modules: the TPU-native rebuild of the reference ops library's
nn.Modules (SURVEY.md §2.3)."""

from .blocks import (MLP, BottleNeck, ConvGRU, Dense, DepthwiseReLU,
                     PointwiseBlock, leaky)
from .cross import (CrossLayerLight, CrossLayerLightFG, CrossLayerLightVote,
                    NoCrossLayerLight)
from .flowhead import (SceneFlowEstimatorPointConv, SceneFlowEstimatorResidual,
                       SceneFlowEstimatorResidualIter)
from .pointconv import (PointConv, PointConvD, PointConvDRand,
                        PointConvNonLinear, group_knn, weighted_contract)
from .weightnet import WeightNet

__all__ = [
    "MLP", "BottleNeck", "ConvGRU", "Dense", "DepthwiseReLU",
    "PointwiseBlock", "leaky",
    "CrossLayerLight", "CrossLayerLightFG", "CrossLayerLightVote",
    "NoCrossLayerLight",
    "SceneFlowEstimatorPointConv", "SceneFlowEstimatorResidual",
    "SceneFlowEstimatorResidualIter",
    "PointConv", "PointConvD", "PointConvDRand", "PointConvNonLinear",
    "group_knn", "weighted_contract",
    "WeightNet",
]
