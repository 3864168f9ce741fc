from photons_tpu.io.gadget import (
    GadgetHeader,
    read_gadget,
    read_gadget_header,
    write_gadget,
)

__all__ = ["GadgetHeader", "read_gadget", "read_gadget_header", "write_gadget"]
