from .cells import *  # noqa: F401,F403
