from vtm.utils.env import setup_environment  # noqa: F401
