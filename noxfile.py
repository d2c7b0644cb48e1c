"""nox sessions: tests / lint / format (reference noxfile.py parity)."""
import nox


@nox.session
def tests(session):
    session.install("-e", ".[dev]")
    session.run("pytest", "tests/", "-x", "-q")


@nox.session
def lint(session):
    session.install("ruff")
    session.run("ruff", "check", "echoseal_tpu", "tests")


@nox.session(name="format")
def format_(session):
    session.install("ruff")
    session.run("ruff", "format", "echoseal_tpu", "tests")
