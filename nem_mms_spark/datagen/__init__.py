from nem_mms_spark.datagen.webpages import web_pages_df  # noqa: F401
