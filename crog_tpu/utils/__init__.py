from crog_tpu.utils.meters import AverageMeter, ProgressMeter  # noqa: F401
from crog_tpu.utils.logging import setup_logger, get_logger  # noqa: F401
