// Empty shim: bamfastq.cpp includes boost accumulators but never uses them.
#ifndef DEFUSE_SHIM_ACCUM_GUARD
#endif
