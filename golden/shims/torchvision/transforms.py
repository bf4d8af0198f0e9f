"""ToTensor with torchvision semantics: PIL/ndarray HWC uint8 -> float32
CHW in [0, 1]."""

import numpy as np
import torch


class ToTensor:
    def __call__(self, pic):
        arr = np.asarray(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
        if t.dtype == torch.uint8:
            t = t.float().div(255.0)
        return t

    def __repr__(self):
        return "ToTensor()"
