from .state import (TrainState, create_train_state, make_eval_step,
                    make_multi_train_step, make_train_step, model_rngs)
from .optimizers import build_optimizers
from .experiment import VAEXperiment, install_preemption_handler
