from univl_tpu.checkpoint.io import save_checkpoint, restore_checkpoint
from univl_tpu.checkpoint.torch_convert import (
    convert_torch_state_dict,
    export_torch_state_dict,
    save_torch_bin,
)
