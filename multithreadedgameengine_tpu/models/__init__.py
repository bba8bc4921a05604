"""Built-in entity model families, ported behaviorally from the reference
demos (the reference's de-facto integration tests, SURVEY.md §4):

- :mod:`balls`      — demos/balls: 10k pooled gravity balls (the
                      trajectory-match target).
- :mod:`boids`      — demos/predators boid flocking core.
- :mod:`predators`  — full predator/prey ecosystem (later round work noted in
                      module docstrings).
"""

from . import balls, boids, predators  # noqa: F401
