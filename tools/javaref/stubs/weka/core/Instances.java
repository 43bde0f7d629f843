package weka.core;
/** Compile-only stub: the weka jar is absent; the liblinear code path
 *  (the shipped default) never touches these classes. */
public class Instances {
    public void setClassIndex(int i) { throw new UnsupportedOperationException("weka stub"); }
    public int numAttributes() { throw new UnsupportedOperationException("weka stub"); }
    public int numInstances() { throw new UnsupportedOperationException("weka stub"); }
}
