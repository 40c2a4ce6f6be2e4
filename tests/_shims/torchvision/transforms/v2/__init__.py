from torchvision.transforms import *
import torch.nn as nn
class ToDtype(nn.Module):
    def __init__(self, *a, **k): super().__init__()
class ToImage(nn.Module):
    def __init__(self, *a, **k): super().__init__()
class Normalize(nn.Module):
    def __init__(self, *a, **k): super().__init__()
