from .resnet import ResNet, BasicBlock, Bottleneck, BatchNorm

__all__ = ['ResNet', 'BasicBlock', 'Bottleneck', 'BatchNorm']
