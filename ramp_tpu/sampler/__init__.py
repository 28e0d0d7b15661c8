from ramp_tpu.sampler.energy import make_eps_fn, make_energy_fn
from ramp_tpu.sampler.guidance_fold import GuidanceFold, cfg_fold, compose_fold
from ramp_tpu.sampler.ddim import ddim_sample_chain
from ramp_tpu.sampler.ddpm import ddpm_sample_chain
