from .dag import Job, Pipeline  # noqa: F401
