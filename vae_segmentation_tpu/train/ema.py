"""EMA teacher update — device-side, inside jit.

The reference walks the state_dict on the host every update
(main_target.py:508-518: sd_teacher[k] = alpha * sd_teacher[k] +
(1 - alpha) * sd_student[k], Seg only, alpha=0.995) — a CPU<->GPU sync point.
Here it is a single fused tree_map on device.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax


@partial(jax.jit, donate_argnums=(0,))
def ema_update_seg(teacher_params: Any, student_params: Any,
                   alpha: float | jax.Array = 0.995) -> Any:
    """teacher.Seg <- alpha * teacher.Seg + (1 - alpha) * student.Seg;
    the teacher's VAE is left untouched (main_target.py:512-516)."""
    new_seg = jax.tree.map(lambda t, s: alpha * t + (1.0 - alpha) * s,
                           teacher_params["Seg"], student_params["Seg"])
    out = dict(teacher_params)
    out["Seg"] = new_seg
    return out


@partial(jax.jit, donate_argnums=(0,))
def copy_params(dst: Any, src: Any) -> Any:
    """Device-side state_dict copy (model_fix.load_state_dict(model...))."""
    del dst
    return jax.tree.map(lambda x: x, src)
