class FmmPlan:  # implemented in a later milestone of this build
    pass
