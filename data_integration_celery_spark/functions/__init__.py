from .numeric import dsum, davg, dsum_window, pct_change, safe_div  # noqa: F401
from .merge_kernels import (  # noqa: F401
    prefer_left, prefer_right, mean_value, get_value, max_up_or_down,
    compile_merge_rules,
)
from .cleaning import (  # noqa: F401
    str_2_float, mfprice_2_num, null_literals_to_null, lower_columns,
    drop_all_null_leading,
)
