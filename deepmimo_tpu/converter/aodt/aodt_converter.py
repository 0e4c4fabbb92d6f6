"""AODT converter (stub — parity with the reference's AODT stub).

The Aerial Omniverse Digital Twin exporter format is not yet public; the
dispatcher routes .aodt folders here so the interface is stable.
"""


def aodt_rt_converter(rt_folder: str, **conversion_params):
    print("converting from aodt")
    raise NotImplementedError(
        "AODT conversion is not implemented yet (stub, as in the upstream "
        "toolchain).")
