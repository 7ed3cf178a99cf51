from seedvc_tpu.models.dit import DiT  # noqa: F401
from seedvc_tpu.models.cfm import CFM, euler_solve  # noqa: F401
from seedvc_tpu.models.regulator import InterpolateRegulator  # noqa: F401
