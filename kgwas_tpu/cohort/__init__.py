from .ukbb import ukbb_cohort, get_fields, get_row_last_values, remove_kinships
