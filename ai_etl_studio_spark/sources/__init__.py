"""Sources & sinks: the engine's ingress/egress surface."""
