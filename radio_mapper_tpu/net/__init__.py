"""Network layer: wire protocol definitions and rtl_tcp compatibility."""
