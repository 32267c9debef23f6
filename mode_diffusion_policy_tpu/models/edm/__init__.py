from .precond import edm_scalings, denoiser_forward, denoiser_loss
from .schedules import get_noise_schedule, NOISE_SCHEDULES
from .densities import make_sample_density, SIGMA_DENSITIES
from .samplers import sample_loop, SAMPLERS
