"""Console-script entry points (oron-train / oron-infer / oron-prepare).

The reference exposes the same three commands via [project.scripts]
(/root/reference/pyproject.toml:57-60); here they live inside the package so
``pip install .`` produces working executables, with thin ``scripts/*.py``
shims kept for path-based invocation.
"""


def validate_quantize_mesh(parser, quantize: str | None, mesh: str | None) -> None:
    """Shared CLI rule: the w8a16 Pallas path has no sharding rules.

    ``int8_dynamic`` (w8a8, plain XLA dot) composes with a mesh; ``int8``
    (dequant-in-kernel Pallas matmul) is single-device only. One place for
    the rule so infer/serve can't drift apart.
    """
    if quantize == "int8" and mesh:
        parser.error("--quantize int8 (w8a16 Pallas) is single-device; "
                     "use int8_dynamic with --mesh")
