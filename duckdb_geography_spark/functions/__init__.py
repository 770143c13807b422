from .accessors import *  # noqa: F401,F403
from .bounds import *  # noqa: F401,F403
from .casts import *  # noqa: F401,F403
from .cells import *  # noqa: F401,F403
from .io import *  # noqa: F401,F403
from .predicates import *  # noqa: F401,F403
