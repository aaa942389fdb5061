from .instantiate import (
    instantiate_from_config,
    get_obj_from_str,
    TARGET_ALIASES,
)
from .merge import (
    load_yaml,
    merge_configs,
    deep_merge,
    apply_dotlist,
    to_plain,
)

__all__ = [
    "instantiate_from_config",
    "get_obj_from_str",
    "TARGET_ALIASES",
    "load_yaml",
    "merge_configs",
    "deep_merge",
    "apply_dotlist",
    "to_plain",
]
