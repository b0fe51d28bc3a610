from .tracknet import (
    TrackNetTrainState,
    gaussian_heatmap_labels,
    make_tracknet_train_step,
    weighted_bce_loss,
)

__all__ = [
    "TrackNetTrainState",
    "gaussian_heatmap_labels",
    "make_tracknet_train_step",
    "weighted_bce_loss",
]
