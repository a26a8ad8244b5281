from vtm.ops.flash_attention import tome_flash_attention  # noqa: F401
