from vae_segmentation_tpu.ops.losses import (  # noqa: F401
    avg_dsc,
    bce,
    binarize,
    confident_binarize,
    dice,
    kl_loss,
    one_hot_label,
    onehot_argmax,
    soft_dice_per_class,
    EVAL_EPS,
    SOURCE_EPS,
)
