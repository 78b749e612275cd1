from . import attention, preprocess  # noqa: F401
