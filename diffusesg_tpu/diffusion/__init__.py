from .edm import (
    VPParams,
    VEParams,
    EDMParams,
    get_vp_params,
    get_ve_params,
    get_edm_params,
    sigma_from_t,
    sigma_deriv_t,
    t_from_sigma,
    get_preconditioning_params,
    sample_training_sigmas_weights,
    NodeAdjEDMObjective,
)
