from raphtory_ray.query.cypher import cypher  # noqa: F401
