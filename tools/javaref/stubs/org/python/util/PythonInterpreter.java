package org.python.util;
import org.python.core.PyObject;
import org.python.core.PySystemState;
public class PythonInterpreter {
    public PythonInterpreter(PyObject dict, PySystemState sys) { }
    public void execfile(String path) { throw new UnsupportedOperationException("jython stub"); }
    public <T> PyObject get(String name, Class<T> cls) { throw new UnsupportedOperationException("jython stub"); }
    public PyObject get(String name) { throw new UnsupportedOperationException("jython stub"); }
}
