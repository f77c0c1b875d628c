"""Developer/debug utilities (reference library/developer.c,
AKO_DEV_PRINTF of library/ako-private.h:11-18)."""

from ako_tpu.utils.developer import save_pgm_i16
from ako_tpu.utils.debug import dev_printf, dev_enabled

__all__ = ["save_pgm_i16", "dev_printf", "dev_enabled"]
