package org.python.core;
public class Py {
    public static PySystemState getSystemState() { throw new UnsupportedOperationException("jython stub"); }
}
