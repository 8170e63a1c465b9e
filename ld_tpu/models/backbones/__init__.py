from .ssd_vgg import SSDVGG, L2Norm
from .darknet import Darknet, ConvBNLeaky
from .resnet import (ResNet, ResNeXt, ResNetV1d, BasicBlock, Bottleneck,
                     BatchNorm, SAConv, DetectoRS_ResNet, TridentResNet)
from .regnet import RegNet
from .res2net import Res2Net
from .resnest import ResNeSt
from .hrnet import HRNet
from .hourglass import HourglassNet

__all__ = ['ResNet', 'ResNeXt', 'ResNetV1d', 'BasicBlock', 'Bottleneck',
           'BatchNorm', 'SSDVGG', 'L2Norm', 'Darknet', 'ConvBNLeaky',
           'RegNet', 'Res2Net', 'ResNeSt', 'HRNet', 'HourglassNet', 'SAConv',
           'DetectoRS_ResNet', 'TridentResNet']
