from vae_segmentation_tpu.eval.evaluate import (  # noqa: F401
    make_analysis_metrics_step,
    make_joint_eval_step,
    make_seg_eval_step,
    make_vae_eval_step,
    run_eval,
)
from vae_segmentation_tpu.eval.postprocess import (  # noqa: F401
    connected_components,
    largest_components,
)
from vae_segmentation_tpu.eval.sliding_window import (  # noqa: F401
    sliding_window_predict,
    window_starts,
)
