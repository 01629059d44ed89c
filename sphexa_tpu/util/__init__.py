from sphexa_tpu.util.kahan import kahan_sum, kahan_dot
from sphexa_tpu.util.timer import StageTimer
