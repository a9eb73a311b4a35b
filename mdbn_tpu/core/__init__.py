from .rbm_math import RBMParams, apply_update, cd_step_stats, free_energy, hidden_mean, visible_mean
from .state import TrainState, init_train_state
