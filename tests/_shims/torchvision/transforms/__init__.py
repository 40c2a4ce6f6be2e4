import torch.nn as nn
class Normalize(nn.Module):
    def __init__(self, *a, **k): super().__init__()
class Compose:
    def __init__(self, t): self.transforms = t
    def __call__(self, x):
        for t in self.transforms: x = t(x)
        return x
class Resize(nn.Module):
    def __init__(self, *a, **k): super().__init__()
class CenterCrop(nn.Module):
    def __init__(self, *a, **k): super().__init__()
class ToTensor:
    pass
class InterpolationMode:
    BICUBIC = "bicubic"
    BILINEAR = "bilinear"
class RandomResizedCrop(nn.Module):
    def __init__(self, *a, **k): super().__init__()
class ColorJitter(nn.Module):
    def __init__(self, *a, **k): super().__init__()
class Grayscale(nn.Module):
    def __init__(self, *a, **k): super().__init__()
class RandomApply(nn.Module):
    def __init__(self, *a, **k): super().__init__()
class RandomGrayscale(nn.Module):
    def __init__(self, *a, **k): super().__init__()
class GaussianBlur(nn.Module):
    def __init__(self, *a, **k): super().__init__()
class RandomHorizontalFlip(nn.Module):
    def __init__(self, *a, **k): super().__init__()
