from . import dictionary, hierarchy, mentions  # noqa: F401
