"""Console-script entry points (oron-train / oron-infer / oron-prepare).

The reference exposes the same three commands via [project.scripts]
(/root/reference/pyproject.toml:57-60); here they live inside the package so
``pip install .`` produces working executables, with thin ``scripts/*.py``
shims kept for path-based invocation.
"""
