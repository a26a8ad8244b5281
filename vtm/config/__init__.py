from vtm.config.node import CfgNode  # noqa: F401
from vtm.config.defaults import get_cfg, assert_and_infer_cfg  # noqa: F401
from vtm.config.parser import parse_args, load_config  # noqa: F401
