from cqdg_etl_spark.operators.nest import group_nest, nest_parent_as_array
