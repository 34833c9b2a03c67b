"""Ray Data stages: stateless batch fns + stateful actor-pool classes."""
