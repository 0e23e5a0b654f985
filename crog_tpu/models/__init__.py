from crog_tpu.models.crog import CROG, build_crog  # noqa: F401
from crog_tpu.models.ssg import SSG, build_ssg  # noqa: F401
