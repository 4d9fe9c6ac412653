"""SH-degree distillation: teacher -> student with pseudo-GT renders.

Counterpart of LightGaussian/distill_train.py: a high-SH-degree teacher
renders pseudo ground truth; a reduced-degree student (same geometry,
truncated SH) is fine-tuned photometrically against those renders. The
student's extra coefficients are dropped, shrinking the model by
(K_teacher - K_student)*3 floats per Gaussian.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Sequence

import jax
import jax.numpy as jnp

from fovsplat.models import state as S
from fovsplat.models.gaussians import GaussianParams
from fovsplat.ops import rasterize as rast
from fovsplat.ops import sh as sh_mod
from fovsplat.train import loops, losses, optim


def truncate_sh(params: GaussianParams, student_degree: int) -> GaussianParams:
    k = sh_mod.num_sh_coeffs(student_degree) - 1
    return dataclasses.replace(params,
                               features_rest=params.features_rest[:, :k])


def distill(teacher: S.TrainerState, views: Sequence, student_degree: int,
            cfg: loops.LoopConfig, iters: int = 2000, seed: int = 0,
            log=print) -> S.TrainerState:
    """Returns a trained student state with SH degree `student_degree`."""
    t_cfg = dataclasses.replace(cfg)
    teacher_render = jax.jit(lambda cam: loops.render_state(
        teacher, cam, t_cfg)["render"])

    student_params = truncate_sh(teacher.params, student_degree)
    student = S.TrainerState(params=student_params,
                             opt=optim.init_state(student_params),
                             live=teacher.live)
    s_cfg = dataclasses.replace(cfg, sh_degree=student_degree)

    @jax.jit
    def step(state, camera, pseudo_gt, it):
        def objective(params):
            st = dataclasses.replace(state, params=params)
            out = loops.render_state(st, camera, s_cfg)
            return losses.photometric_loss(out["render"], pseudo_gt,
                                           s_cfg.lambda_dssim)

        loss, grads = jax.value_and_grad(objective)(state.params)
        lrs = optim.learning_rates(state.params, it, s_cfg.optim,
                                   s_cfg.spatial_lr_scale)
        params, opt = optim.apply_updates(state.params, grads, state.opt,
                                          lrs, s_cfg.optim)
        return dataclasses.replace(state, params=params, opt=opt), loss

    rng = random.Random(seed)
    stack = []
    for it in range(1, iters + 1):
        if not stack:
            stack = list(views)
            rng.shuffle(stack)
        v = stack.pop()
        pseudo = teacher_render(v.camera)
        student, loss = step(student, v.camera, pseudo, jnp.int32(it))
        if it % 200 == 0:
            log(f"[distill] it={it} loss={float(loss):.5f}")
    return student
