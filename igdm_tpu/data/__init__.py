from igdm_tpu.data.mat import load_synthetic_images, dataset_path
from igdm_tpu.data.images import save_gray_png, tile_grid, save_image_heatmap
from igdm_tpu.data.loader import epoch_batches

__all__ = [
    "load_synthetic_images",
    "dataset_path",
    "save_gray_png",
    "tile_grid",
    "save_image_heatmap",
    "epoch_batches",
]
