from vae_segmentation_tpu.train import optim  # noqa: F401
from vae_segmentation_tpu.train.ema import copy_params, ema_update_seg  # noqa: F401
from vae_segmentation_tpu.train.steps import (  # noqa: F401
    AdaptConfig,
    TrainState,
    adapt_loss,
    default_sched,
    init_state,
    make_adapt_dis_step,
    make_adapt_step,
    make_cached_pseudo_adapt_step,
    make_discriminator_step,
    make_embed_train_step,
    make_finetune_step,
    make_joint_train_step,
    make_refine_vae_step,
    make_sep_joint_train_step,
    make_seg_replay_step,
    make_seg_train_step,
    make_vae_train_step,
)
