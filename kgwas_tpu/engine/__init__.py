from .optim import torch_adam
from .loop import make_train_step, make_forward, build_optimizer, epoch_batches
from .checkpoint import (
    save_model,
    load_model,
    flatten_params,
    unflatten_params,
    import_torch_state_dict,
)
