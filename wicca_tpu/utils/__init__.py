from wicca_tpu.utils.env import is_jupyter, preserve_depth
from wicca_tpu.utils.timing import StageTimer, format_proc_time, trace
