from .net2d import Net2DSeg  # noqa: F401
from .resnet2d import ResNet34Encoder  # noqa: F401
from .sparse_unet import Net3DSeg, UNetSCN3D  # noqa: F401
