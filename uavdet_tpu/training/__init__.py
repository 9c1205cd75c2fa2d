from .optim import build_optimizer, cyclic_triangular2
from .steps import make_train_step, make_eval_step, init_state
