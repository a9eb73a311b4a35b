from . import cd_epoch_pallas, cd_step, sample, transform
from .cd_step import cd_train_step, draw_uniforms
