from gaussianeditor_tpu.config.config import (
    C,
    load_config,
    merge_dotlist,
    parse_structured,
)
