"""Model zoo: sparse ResNets and the MinkUNet segmentation family."""

from .minkunet import (
    MinkUNet14,
    MinkUNet14A,
    MinkUNet14B,
    MinkUNet14C,
    MinkUNet14D,
    MinkUNet18,
    MinkUNet18A,
    MinkUNet18B,
    MinkUNet18D,
    MinkUNet34,
    MinkUNet34A,
    MinkUNet34B,
    MinkUNet34C,
    MinkUNet50,
    MinkUNet101,
    MinkUNetBase,
)
from .completion import CompletionNet
from .vae import VAE, Decoder as VAEDecoder, Encoder as VAEEncoder
from .classification import (
    MinkowskiFCNN,
    MinkowskiPointNet,
    MinkowskiSplatFCNN,
)
from .resnet import (
    ResNet14,
    ResNet18,
    ResNet34,
    ResNet50,
    ResNet101,
    ResNetBase,
)
