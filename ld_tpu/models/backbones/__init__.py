from .ssd_vgg import SSDVGG, L2Norm
from .darknet import Darknet, ConvBNLeaky
from .resnet import (ResNet, ResNeXt, ResNetV1d, BasicBlock, Bottleneck,
                     BatchNorm)

__all__ = ['ResNet', 'ResNeXt', 'ResNetV1d', 'BasicBlock', 'Bottleneck',
           'BatchNorm', 'SSDVGG', 'L2Norm', 'Darknet', 'ConvBNLeaky']
