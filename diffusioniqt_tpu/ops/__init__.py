from diffusioniqt_tpu.ops.volume import (  # noqa: F401
    boundary_halo,
    from_torch_layout,
    merge_sub_volumes,
    pixel_shuffle_3d,
    pixel_unshuffle_3d,
    resize_volume,
    subvolumes_to_volume,
    to_torch_layout,
    volume_to_subvolumes,
)
