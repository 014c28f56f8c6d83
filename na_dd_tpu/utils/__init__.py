from na_dd_tpu.utils.timing import Timed, timed_block

__all__ = ["Timed", "timed_block"]
