from diffusioniqt_tpu.data.datasets import (  # noqa: F401
    FakeIQTDataset,
    SupervisedIQT,
    SupervisedIQTInference,
)
from diffusioniqt_tpu.data.loader import DataLoader, collate_drop_none  # noqa: F401
from diffusioniqt_tpu.data.stitching import (  # noqa: F401
    VolumeStitcher,
    sliding_window_grid,
)
