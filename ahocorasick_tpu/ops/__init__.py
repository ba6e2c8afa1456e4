from .block_scan import DeviceAutomaton  # noqa: F401
