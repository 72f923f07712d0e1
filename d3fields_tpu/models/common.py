"""Constants shared across model preprocessing pipelines."""

import numpy as np

# ImageNet normalization (every backbone here — DINOv2, GroundingDINO,
# XMem — uses the same torchvision stats)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
