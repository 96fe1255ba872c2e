"""Sampler factory (reference: DiffuseSG/utils/sampling_utils.py:8-31)."""
from __future__ import annotations

from .edm_sampler import NodeAdjEDMSampler


def get_mc_sampler(config) -> NodeAdjEDMSampler:
    if config.mcmc.name != "edm":
        raise NotImplementedError("only the EDM sampler family is supported")
    return NodeAdjEDMSampler(
        solver="heun",
        discretization="edm",
        schedule="linear",
        scaling="none",
        num_steps=config.mcmc.num_steps,
        self_condition=config.train.self_cond,
        symmetric_noise=not config.flag_sg,
        # opt-in reproduction of the reference's UNGATED sampling-time
        # precond self-cond refresh (precond.py:90-98 + learning_utils.py:
        # 71-75; the reference effectively runs 0.5) — default 0.0 keeps
        # sampling deterministic and ~1.5x cheaper
        precond_self_cond_refresh_p=float(
            config.mcmc.get("precond_self_cond_refresh_p", 0.0)),
    )
