from adfmsl.models import lcnn as _lcnn      # noqa: F401 (registers lcnn_lfcc)
from adfmsl.models import resnet as _resnet  # noqa: F401 (registers resnet18_logmel)
from adfmsl.models.blocks import (
    AttentiveStatsPooling,
    ConvFMSLLayer,
    GRU,
    ResBlockSE,
    ResStack,
    SEBlock,
    TransformerEncoderLayer,
    TransformerEncoderStack,
)
from adfmsl.models.lcnn import LCNN, LCNN1D
from adfmsl.models.mazes import SPECS, MazeModel, MazeSpec, build_model, model_registry
from adfmsl.models.pretrained import (
    inject_pretrained_w2v2,
    load_w2v2_params,
    save_native,
)
from adfmsl.models.rawnet import RawNetEncoder
from adfmsl.models.resnet import ResNet18
from adfmsl.models.sincnet import SincConv
from adfmsl.models.w2v2 import (
    W2V2Arch,
    Wav2Vec2Encoder,
    load_pretrained,
    port_hf_state_dict,
)

__all__ = [
    "AttentiveStatsPooling", "ConvFMSLLayer", "GRU", "ResBlockSE", "ResStack",
    "SEBlock", "TransformerEncoderLayer", "TransformerEncoderStack",
    "LCNN", "LCNN1D", "ResNet18", "SPECS", "MazeModel", "MazeSpec", "build_model",
    "model_registry", "RawNetEncoder", "SincConv",
    "inject_pretrained_w2v2", "load_w2v2_params", "save_native",
    "W2V2Arch", "Wav2Vec2Encoder", "load_pretrained", "port_hf_state_dict",
]
