from fvd_tpu.runtime.dag import DAG, NodeSpec  # noqa: F401
from fvd_tpu.runtime.scheduler import Scheduler, NodeEvent  # noqa: F401
from fvd_tpu.runtime.status import StatusBoard  # noqa: F401
from fvd_tpu.runtime.debug import dump_node_debug  # noqa: F401
from fvd_tpu.runtime.tracer import Tracer, get_tracer, set_tracer  # noqa: F401
