from .fixtures import ALL_FIXTURES
from .generators import artificial_suite, generate, powerlaw

__all__ = ["ALL_FIXTURES", "artificial_suite", "generate", "powerlaw"]
