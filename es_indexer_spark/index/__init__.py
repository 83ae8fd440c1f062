from .build import build_index  # noqa: F401
from .catalog import current_version_dir, publish_version  # noqa: F401
